"""CBOR codec (RFC 8949) + late-round VRL additions — hand-built
bytes from the RFC's appendix-A examples pin spec conformance."""

import json
import struct

import pytest
from pyspark.sql import Row, functions as F

from vector_spark.functions.cbor import (
    decode_cbor,
    decode_cbor_py,
    encode_cbor,
    encode_cbor_py,
)
from vector_spark.functions.vrl import (
    parse_tokens,
    screamingsnakecase,
    unzip_arrays,
    uuid_v7,
)


# RFC 8949 appendix A examples (diagnostic, hex) — independent of our
# encoder
RFC_CASES = [
    (bytes.fromhex("00"), 0),
    (bytes.fromhex("17"), 23),
    (bytes.fromhex("1818"), 24),
    (bytes.fromhex("1a000f4240"), 1000000),
    (bytes.fromhex("20"), -1),
    (bytes.fromhex("3863"), -100),
    (bytes.fromhex("f4"), False),
    (bytes.fromhex("f5"), True),
    (bytes.fromhex("f6"), None),
    (bytes.fromhex("f90000"), 0.0),
    (bytes.fromhex("f93c00"), 1.0),
    (bytes.fromhex("fb3ff199999999999a"), 1.1),
    (bytes.fromhex("63e6b0b4"), "水"),
    (bytes.fromhex("83010203"), [1, 2, 3]),
    (bytes.fromhex("a201020304"), {"1": 2, "3": 4}),  # int keys stringify
    (bytes.fromhex("a26161016162820203"), {"a": 1, "b": [2, 3]}),
    (bytes.fromhex("5f42010243030405ff"),
     b"\x01\x02\x03\x04\x05"),  # indefinite bytes
    (bytes.fromhex("9f018202039f0405ffff"),
     [1, [2, 3], [4, 5]]),  # indefinite array
    (bytes.fromhex("c074323031332d30332d32315432303a30343a30305a"),
     "2013-03-21T20:04:00Z"),  # tag 0 passes through
]


@pytest.mark.parametrize("blob,want", RFC_CASES)
def test_rfc8949_appendix_a(blob, want):
    got = decode_cbor_py(blob)
    if isinstance(want, float):
        assert got == pytest.approx(want)
    else:
        assert got == want


def test_cbor_roundtrip_nested():
    v = {"a": [1, -5, "x", None, True], "b": {"c": 2.5, "d": "é"},
         "n": -(2**40)}
    assert decode_cbor_py(encode_cbor_py(v)) == v


def test_cbor_trailing_rejected():
    with pytest.raises(ValueError, match="trailing"):
        decode_cbor_py(bytes.fromhex("0001"))


def test_cbor_half_floats():
    # RFC appendix: f97c00 = Inf, f9fc00 = -Inf (render None in JSON
    # seam but decode as floats here)
    assert decode_cbor_py(bytes.fromhex("f97c00")) == float("inf")
    assert decode_cbor_py(bytes.fromhex("f9fc00")) == float("-inf")
    assert decode_cbor_py(bytes.fromhex("f90001")) == pytest.approx(
        5.960464477539063e-8)


def test_cbor_spark_seam(spark):
    df = spark.createDataFrame(
        [Row(b=encode_cbor_py({"k": i, "s": f"v{i}"})) for i in range(10)]
    )
    out = df.select(
        F.from_json(decode_cbor(F.col("b")), "k int, s string").alias("r")
    ).select("r.*").collect()
    assert sorted((r["k"], r["s"]) for r in out) == [
        (i, f"v{i}") for i in range(10)
    ]
    # encode seam: JSON -> CBOR -> decode equals original
    j = df.select(decode_cbor(encode_cbor(decode_cbor(F.col("b"))))
                  .alias("j")).collect()
    assert all(json.loads(r["j"])["s"].startswith("v") for r in j)
    # invalid -> NULL
    bad = spark.createDataFrame([Row(b=b"\xff\x00")]).select(
        decode_cbor(F.col("b")).alias("j")).collect()
    assert bad[0]["j"] is None


def test_parse_tokens(spark):
    line = ('127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] '
            '"GET /apache_pb.gif HTTP/1.0" 200 2326')
    out = spark.createDataFrame([Row(t=line)]).select(
        parse_tokens(F.col("t")).alias("toks")).collect()[0]["toks"]
    assert out == [
        "127.0.0.1", None, "frank", "10/Oct/2000:13:55:36 -0700",
        "GET /apache_pb.gif HTTP/1.0", "200", "2326",
    ]


def test_screamingsnakecase(spark):
    out = spark.createDataFrame([Row(s="inputText"), Row(s="Input-Text")]) \
        .select(screamingsnakecase(F.col("s")).alias("v")).collect()
    assert {r["v"] for r in out} == {"INPUT_TEXT"}


def test_unzip_arrays(spark):
    out = spark.createDataFrame(
        [Row(p=[["a", "1"], ["b", "2"], ["c", "3"]])]
    ).select(unzip_arrays(F.col("p")).alias("u")).collect()[0]["u"]
    assert out == [["a", "b", "c"], ["1", "2", "3"]]


def test_uuid_v7_shape_and_ordering(spark):
    df = spark.createDataFrame(
        [Row(ts="2026-01-01 00:00:00"), Row(ts="2026-06-01 00:00:00")]
    ).select(F.col("ts"), uuid_v7(F.to_timestamp("ts")).alias("u"))
    rows = {r["ts"]: r["u"] for r in df.collect()}
    import re as _re

    pat = _re.compile(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}-"
        r"[0-9a-f]{12}$"
    )
    for u in rows.values():
        assert pat.match(u), u
    # time-ordered: the millis prefix sorts with the timestamp
    assert rows["2026-01-01 00:00:00"] < rows["2026-06-01 00:00:00"]


def test_parse_proto_vrl_surface(spark, tmp_path):
    from vector_spark.functions.vrl import encode_proto, parse_proto

    proto = tmp_path / "m.proto"
    proto.write_text(
        "syntax = \"proto3\";\n"
        "message M { string a = 1; int64 b = 2; }\n"
    )
    df = spark.createDataFrame([Row(a="x", b=7), Row(a="y", b=-2)])
    enc = df.select(
        "a", "b",
        encode_proto(str(proto), "M", F.col("a"), F.col("b")).alias("pb"),
    )
    dec = enc.select(
        "a", "b", parse_proto(F.col("pb"), str(proto), "M").alias("r")
    )
    assert dec.where(
        (F.col("r.a") != F.col("a")) | (F.col("r.b") != F.col("b"))
    ).count() == 0


def test_vrl_surface_completion_batch(spark):
    from vector_spark.functions import vrl

    df = spark.createDataFrame([Row(
        s="héllo", num="3.5", bad="x2", n=255,
        m={"a": "1"}, pairs=[["k1", "v1"], ["k2", "v2"]],
        arr=["a", "b", "c"],
        j='{"a": {"b": 1}, "c": [true, null]}',
        notj="{nope", mime="=?utf-8?Q?caf=C3=A9?= ok",
        ip4="10.1.2.3", ip6="::1",
    )])
    out = df.select(
        vrl.strlen(F.col("s")).alias("sl"),
        vrl.parse_float(F.col("num")).alias("f"),
        vrl.parse_float(F.col("bad")).alias("fbad"),
        vrl.format_int(F.col("n"), 16).alias("hex"),
        vrl.is_json(F.col("j")).alias("isj"),
        vrl.is_json(F.col("notj")).alias("isnj"),
        vrl.map_values(F.col("m"), lambda v: F.concat(v, F.lit("!")))
        .alias("mv"),
        vrl.object_from_array(F.col("pairs")).alias("obj"),
        vrl.contains_all(F.col("arr"), ["a", "c"]).alias("ca"),
        vrl.contains_all(F.col("arr"), ["a", "z"]).alias("cz"),
        vrl.flatten_object(F.col("j")).alias("flat"),
        vrl.decode_mime_q(F.col("mime")).alias("mimed"),
        vrl.ip_ntop(vrl.ip_pton(F.col("ip4"))).alias("rt4"),
        vrl.ip_ntop(vrl.ip_pton(F.col("ip6"))).alias("rt6"),
        vrl.get_timezone_name().alias("tz"),
    ).collect()[0]
    assert out["sl"] == 5
    assert out["f"] == 3.5 and out["fbad"] is None
    assert out["hex"] == "ff"
    assert out["isj"] is True and out["isnj"] is False
    assert out["mv"] == {"a": "1!"}
    assert out["obj"] == {"k1": "v1", "k2": "v2"}
    assert out["ca"] is True and out["cz"] is False
    assert json.loads(out["flat"]) == {"a.b": 1, "c.0": True, "c.1": None}
    assert out["mimed"] == "café ok"
    assert out["rt4"] == "10.1.2.3" and out["rt6"] == "::1"
    assert isinstance(out["tz"], str) and out["tz"]


def test_match_datadog_query_vrl_surface(spark):
    from vector_spark.functions.vrl import match_datadog_query

    df = spark.createDataFrame([
        Row(message="payment failed hard", status="error"),
        Row(message="ok", status="info"),
    ])
    kept = df.filter(
        match_datadog_query("status:error AND failed",
                            columns=set(df.columns))
    ).collect()
    assert len(kept) == 1 and kept[0]["status"] == "error"


def test_zstd_snappy_gated():
    from vector_spark.functions.vrl import encode_snappy, encode_zstd

    for fn in (encode_zstd, encode_snappy):
        with pytest.raises(RuntimeError, match="requires"):
            fn(F.lit(b"x"))


def test_parse_influxdb_vrl_surface(spark):
    from vector_spark.functions.vrl import parse_influxdb

    df = spark.createDataFrame([
        Row(line="cpu,host=h1 usage=0.5,idle=99 1700000000000000000")
    ])
    r = df.select(parse_influxdb(F.col("line")).alias("m")).collect()[0]["m"]
    assert r is not None


def test_format_int_negative_bases(spark):
    """Round-5 advice (low): conv() is unsigned-64, so negative inputs
    need an explicit sign — VRL's format_int(-255, 16) is '-ff', not
    the two's-complement 'ffffffffffffff01'.  i64::MIN must not
    overflow the magnitude computation."""
    from pyspark.sql import Row

    from vector_spark.functions import vrl

    df = spark.createDataFrame([Row(a=-255, b=255, c=-9223372036854775808,
                                    d=-10, e=0)])
    out = df.select(
        vrl.format_int(F.col("a"), 16).alias("neg_hex"),
        vrl.format_int(F.col("b"), 16).alias("pos_hex"),
        vrl.format_int(F.col("c"), 16).alias("min_hex"),
        vrl.format_int(F.col("d"), 2).alias("neg_bin"),
        vrl.format_int(F.col("d")).alias("neg_dec"),
        vrl.format_int(F.col("e"), 16).alias("zero_hex"),
    ).collect()[0]
    assert out["neg_hex"] == "-ff"
    assert out["pos_hex"] == "ff"
    assert out["min_hex"] == "-8000000000000000"
    assert out["neg_bin"] == "-1010"
    assert out["neg_dec"] == "-10"
    assert out["zero_hex"] == "0"


def test_encode_cef_reference_shape(spark):
    """encoding/format/cef.rs:292-345: header escaping, sorted
    extensions, skip-empty, severity validation."""
    from vector_spark.functions import vrl

    df = spark.createDataFrame(
        [("evt|one", 5, "a=b", "x", ""), ("n", 11, "v", None, "y")],
        "name string, sev int, cs1 string, src string, act string",
    )
    out = df.select(
        vrl.encode_cef(
            F.col("name"), F.col("sev"),
            device_vendor="v|d",
            device_product="p",
            device_version="1",
            device_event_class_id="c",
            extensions={
                "src": F.col("src"),
                "cs1": F.col("cs1"),
                "act": F.col("act"),
            },
        ).alias("line")
    ).collect()
    # header pipes escaped (name AND device settings), extension '='
    # escaped, extensions sorted, empty act skipped
    assert out[0]["line"] == (
        "CEF:0|v\\|d|p|1|c|evt\\|one|5|act= cs1=a\\=b src=x"
        .replace("act= ", "")  # empty act skipped entirely
    )
    # severity 11 > 10: serializer error -> NULL row result
    assert out[1]["line"] is None


def test_encode_cef_parse_cef_inverse(spark):
    from vector_spark.functions import vrl

    df = spark.createDataFrame(
        [("path|with\\pipes", "k=v \\ w", 0)],
        "name string, ext string, sev int",
    )
    c = vrl.parse_cef(
        vrl.encode_cef(F.col("name"), F.col("sev"),
                       extensions={"msg": F.col("ext")})
    )
    row = df.select(
        c.getField("name").alias("name"),
        F.element_at(c.getField("extensions"), "msg").alias("msg"),
        c.getField("severity").cast("int").alias("sev"),
        c.getField("device_vendor").alias("vendor"),
    ).collect()[0]
    assert row["name"] == "path|with\\pipes"
    assert row["msg"] == "k=v \\ w"
    assert row["sev"] == 0
    assert row["vendor"] == "Datadog"  # cef.rs:17 default


def test_encode_cef_prefix_key_sort(spark):
    """The reference sorts FORMATTED 'key=value' strings: key 'a1'
    sorts before 'a' because '1' < '='."""
    from vector_spark.functions import vrl

    df = spark.createDataFrame([("x", "y", 1)], "a string, a1 string, sev int")
    line = df.select(
        vrl.encode_cef(
            F.lit("n"), F.col("sev"),
            extensions={"a": F.col("a"), "a1": F.col("a1")},
        ).alias("l")
    ).collect()[0]["l"]
    assert line.endswith("|a1=y a=x")
