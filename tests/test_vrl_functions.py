"""VRL scalar-function surface: expected-value tests per category
(SURVEY §2.7 checklist)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.functions import vrl


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_parse_syslog(spark):
    line = "<34>Oct 11 22:14:15 host1 sshd[4242]: Failed password for root"
    v = _one(spark, vrl.parse_syslog(F.lit(line)))
    assert v["facility"] == 4 and v["severity"] == 2
    assert v["hostname"] == "host1" and v["appname"] == "sshd"
    assert v["procid"] == 4242
    assert v["message"] == "Failed password for root"
    assert _one(spark, vrl.parse_syslog(F.lit("not syslog"))) is None


def test_parse_url(spark):
    v = _one(spark, vrl.parse_url(F.lit("https://u:p@ex.com:8443/a/b?x=1#top")))
    assert (v["scheme"], v["host"], v["port"], v["path"], v["query"], v["fragment"]) == (
        "https", "ex.com", "8443", "/a/b", "x=1", "top"
    )
    assert v["username"] == "u" and v["password"] == "p"


def test_parse_duration(spark):
    assert _one(spark, vrl.parse_duration(F.lit("300ms"))) == 0.3
    assert _one(spark, vrl.parse_duration(F.lit("2h"))) == 7200.0
    assert _one(spark, vrl.parse_duration(F.lit("1500ms"), unit="ms")) == 1500.0
    assert _one(spark, vrl.parse_duration(F.lit("nope"))) is None


def test_parse_grok(spark):
    v = _one(spark, vrl.parse_grok(F.lit("192.168.1.1 GET 200"),
                                   "%{IP:ip} %{WORD:verb} %{INT:status}"))
    assert (v["ip"], v["verb"], v["status"]) == ("192.168.1.1", "GET", "200")


def test_coerce_and_coalesce(spark):
    assert _one(spark, vrl.to_int(F.lit("42"))) == 42
    assert _one(spark, vrl.to_int(F.lit("x"))) is None
    assert _one(spark, vrl.coalesce_or(vrl.to_int(F.lit("x")), -1)) == -1
    assert _one(spark, vrl.to_unix_timestamp(F.lit("2026-01-01 00:00:00").cast("timestamp"))) == 1767225600


def test_string_functions(spark):
    assert _one(spark, vrl.truncate(F.lit("abcdef"), 3, "...")) == "abc..."
    assert _one(spark, vrl.truncate(F.lit("ab"), 3, "...")) == "ab"
    assert _one(spark, vrl.slugify(F.lit("Hello, World! 42"))) == "hello-world-42"
    assert _one(spark, vrl.match(F.lit("abc123"), r"\d+"))
    assert _one(spark, vrl.strip_whitespace(F.lit("  x "))) == "x"


def test_array_functions(spark):
    arr = F.array(F.lit(1), F.lit(2), F.lit(2), F.lit(3))
    assert _one(spark, vrl.includes(arr, 2)) is True
    assert _one(spark, vrl.unique(arr)) == [1, 2, 3]
    assert _one(spark, vrl.push(arr, 9)) == [1, 2, 2, 3, 9]
    assert _one(spark, vrl.length(arr)) == 4
    assert _one(spark, vrl.filter_array(arr, lambda x: x > 1)) == [2, 2, 3]


def test_codec_functions(spark):
    assert _one(spark, vrl.encode_base64(F.lit("hi"))) == "aGk="
    assert _one(spark, vrl.decode_base64(F.lit("aGk="))) == "hi"
    assert _one(spark, vrl.encode_json(F.struct(F.lit(1).alias("a")))) == '{"a":1}'


def test_crypto(spark):
    assert _one(spark, vrl.md5(F.lit("abc"))) == "900150983cd24fb0d6963f7d28e17f72"
    assert _one(spark, vrl.sha2(F.lit("abc"), 256)).startswith("ba7816bf")
    v1, v2 = spark.range(2).select(vrl.uuid_v4().alias("u")).collect()
    assert v1["u"] != v2["u"]


def test_ip_functions(spark):
    assert _one(spark, vrl.ip_to_long(F.lit("10.0.0.1"))) == 10 * 16777216 + 1
    assert _one(spark, vrl.ip_cidr_contains("10.0.0.0/8", F.lit("10.200.3.4"))) is True
    assert _one(spark, vrl.ip_cidr_contains("10.0.0.0/8", F.lit("11.0.0.1"))) is False
    assert _one(spark, vrl.ip_cidr_contains("192.168.4.0/22", F.lit("192.168.7.255"))) is True
    assert _one(spark, vrl.ip_cidr_contains("192.168.4.0/22", F.lit("192.168.8.0"))) is False
    assert _one(spark, vrl.ip_subnet(F.lit("192.168.7.13"), 22)) == "192.168.4.0"


def test_merge_and_struct_ops(spark):
    a = F.struct(F.lit(1).alias("x"), F.lit(None).cast("int").alias("y"))
    b = F.struct(F.lit(None).cast("int").alias("x"), F.lit(5).alias("y"))
    v = _one(spark, vrl.merge_structs(a, b, ["x", "y"]))
    assert (v["x"], v["y"]) == (1, 5)


def test_parse_csv_and_kv(spark):
    v = _one(spark, vrl.parse_csv(F.lit("a,1,true"), "s string, n int, b boolean"))
    assert (v["s"], v["n"], v["b"]) == ("a", 1, True)
    kv = _one(spark, vrl.parse_key_value(F.lit("a=1 b=2")))
    assert kv == {"a": "1", "b": "2"}
