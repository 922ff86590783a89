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


def test_parse_xml(spark):
    xml = "<event><id>7</id><msg>hello</msg></event>"
    v = _one(spark, vrl.parse_xml(F.lit(xml), "id int, msg string"))
    assert (v["id"], v["msg"]) == (7, "hello")


def test_parse_cef(spark):
    line = ("CEF:0|Security|threatmanager|1.0|100|worm stopped|10|"
            "src=10.0.0.1 dst=2.1.2.2 spt=1232 msg=hello there")
    v = _one(spark, vrl.parse_cef(F.lit(line)))
    assert v["cef_version"] == 0
    assert v["device_vendor"] == "Security"
    assert v["device_product"] == "threatmanager"
    assert v["device_event_class_id"] == "100"
    assert v["name"] == "worm stopped"
    assert v["severity"] == "10"
    assert v["extensions"]["src"] == "10.0.0.1"
    assert v["extensions"]["spt"] == "1232"
    assert v["extensions"]["msg"] == "hello there"  # spaces inside value
    # escaped pipe in a header field
    v2 = _one(spark, vrl.parse_cef(
        F.lit(r"CEF:1|a\|b|p|1|id|n|3|k=v")))
    assert v2["device_vendor"] == "a|b"
    assert _one(spark, vrl.parse_cef(F.lit("not cef"))) is None


def test_parse_aws_vpc_flow_log(spark):
    line = ("2 123456789010 eni-1235b8ca 172.31.16.139 172.31.16.21 "
            "20641 22 6 20 4249 1418530010 1418530070 ACCEPT OK")
    v = _one(spark, vrl.parse_aws_vpc_flow_log(F.lit(line)))
    assert v["version"] == 2 and v["account_id"] == "123456789010"
    assert v["srcaddr"] == "172.31.16.139" and v["dstport"] == 22
    assert v["packets"] == 20 and v["bytes"] == 4249
    assert v["action"] == "ACCEPT" and v["log_status"] == "OK"
    # NODATA line: '-' placeholders become null
    nd = ("2 123456789010 eni-1a2b3c4d - - - - - - - "
          "1431280876 1431280934 - NODATA")
    v2 = _one(spark, vrl.parse_aws_vpc_flow_log(F.lit(nd)))
    assert v2["srcaddr"] is None and v2["action"] is None
    assert v2["log_status"] == "NODATA"


def test_parse_nginx_log(spark):
    line = ('203.0.113.9 - alice [17/Aug/2026:10:00:00 +0000] '
            '"GET /index.html HTTP/1.1" 200 512 "http://ref.example" '
            '"Mozilla/5.0"')
    v = _one(spark, vrl.parse_nginx_log(F.lit(line)))
    assert v["client"] == "203.0.113.9" and v["user"] == "alice"
    assert v["request"] == "GET /index.html HTTP/1.1"
    assert v["status"] == 200 and v["size"] == 512
    assert v["referer"] == "http://ref.example"
    anon = ('10.0.0.1 - - [17/Aug/2026:10:00:00 +0000] "GET / HTTP/1.1" '
            '404 0 "-" "-"')
    v2 = _one(spark, vrl.parse_nginx_log(F.lit(anon)))
    assert v2["user"] is None and v2["referer"] is None and v2["agent"] is None


def test_parse_user_agent(spark):
    ua = ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
          "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36")
    v = _one(spark, vrl.parse_user_agent(F.lit(ua)))
    assert v["browser_family"] == "Chrome"
    assert v["browser_version"].startswith("120.")
    assert v["os_family"] == "Windows" and v["os_version"] == "10.0"
    assert v["device_category"] == "pc"
    bot = _one(spark, vrl.parse_user_agent(
        F.lit("Googlebot/2.1 (+http://www.google.com/bot.html)")))
    assert bot["browser_family"] == "Bot"
    assert bot["device_category"] == "crawler"
    mac = _one(spark, vrl.parse_user_agent(F.lit(
        "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15"
        " (KHTML, like Gecko) Version/17.0 Safari/605.1.15")))
    assert mac["browser_family"] == "Safari" and mac["os_family"] == "macOS"
    assert mac["os_version"] == "10.15.7"


def test_gzip_zlib_round_trip(spark):
    payload = "the quick brown fox " * 20
    col = F.lit(payload)
    back = vrl.decode_gzip(vrl.encode_gzip(col)).cast("string")
    assert _one(spark, back) == payload
    back2 = vrl.decode_zlib(vrl.encode_zlib(col)).cast("string")
    assert _one(spark, back2) == payload
    # deterministic bytes (mtime pinned) — safe for oracle hashing
    import gzip
    expected = gzip.compress(payload.encode(), compresslevel=6, mtime=0)
    got = _one(spark, vrl.encode_gzip(col))
    assert bytes(got) == expected


def test_optional_codecs_raise_clearly():
    import pytest as _pytest
    from pyspark.sql import functions as _F

    with _pytest.raises(RuntimeError, match="zstandard"):
        vrl.decode_zstd(_F.lit(b"x"))
    with _pytest.raises(RuntimeError, match="snappy"):
        vrl.decode_snappy(_F.lit(b"x"))


def test_sha3_and_hmac(spark):
    import hashlib
    import hmac as _hmac

    assert _one(spark, vrl.sha3(F.lit("abc"), "SHA3-256")) == hashlib.sha3_256(
        b"abc"
    ).hexdigest()
    assert _one(spark, vrl.sha3(F.lit("abc"))) == hashlib.sha3_512(b"abc").hexdigest()
    assert _one(spark, vrl.hmac_sha(F.lit("msg"), "key")) == _hmac.new(
        b"key", b"msg", hashlib.sha256
    ).hexdigest()
    import pytest as _pytest
    with _pytest.raises(ValueError):
        vrl.sha3(F.lit("x"), "SHA3-123")


def test_base16_percent_codecs(spark):
    assert _one(spark, vrl.encode_base16(F.lit("abc"))) == "616263"
    assert _one(spark, vrl.decode_base16(F.lit("616263"))) == "abc"
    assert _one(spark, vrl.encode_percent(F.lit("a b&c"))) == "a+b%26c"
    assert _one(spark, vrl.decode_percent(F.lit("a%20b%26c"))) == "a b&c"


def test_parse_query_string(spark):
    v = _one(spark, vrl.parse_query_string(F.lit("?a=1&b=two%20x&flag=")))
    assert v == {"a": "1", "b": "two x", "flag": ""}
    # later duplicate wins
    v2 = _one(spark, vrl.parse_query_string(F.lit("k=1&k=2")))
    assert v2 == {"k": "2"}


def test_parse_int_radix(spark):
    assert _one(spark, vrl.parse_int(F.lit("42"))) == 42
    assert _one(spark, vrl.parse_int(F.lit("ff"), base=16)) == 255
    assert _one(spark, vrl.parse_int(F.lit("101"), base=2)) == 5
    assert _one(spark, vrl.parse_int(F.lit("zz"))) is None


def test_nullish_and_empty(spark):
    assert _one(spark, vrl.is_nullish(F.lit("  "))) is True
    assert _one(spark, vrl.is_nullish(F.lit("-"))) is True
    assert _one(spark, vrl.is_nullish(F.lit("x"))) is False
    assert _one(spark, vrl.is_empty(F.lit(""))) is True
    assert _one(spark, vrl.is_empty(F.lit("a"))) is False
    # containers: VRL is_empty([]) == is_empty({}) == true
    assert _one(spark, vrl.is_empty(F.array(), kind="array")) is True
    assert _one(spark, vrl.is_empty(F.array(F.lit(1)), kind="array")) is False
    assert _one(
        spark, vrl.is_empty(F.map_from_arrays(F.array(), F.array()),
                            kind="map")
    ) is True
    assert _one(
        spark,
        vrl.is_empty(
            F.map_from_arrays(F.array(F.lit("k")), F.array(F.lit("v"))),
            kind="map",
        ),
    ) is False


def test_encrypt_decrypt_roundtrip(spark):
    key16, key32 = "0123456789abcdef", "0123456789abcdef0123456789abcdef"
    for algo, key in [("AES-128-GCM", key16), ("AES-256-GCM", key32),
                      ("AES-256-CBC-PKCS7", key32), ("AES-128-ECB-PKCS7", key16)]:
        got = _one(
            spark,
            vrl.decrypt(vrl.encrypt(F.lit("secret payload"), algo, key), algo, key),
        )
        assert got == "secret payload", algo
    # wrong key → null (try-variant), not an exception
    assert _one(
        spark,
        vrl.decrypt(
            vrl.encrypt(F.lit("x"), "AES-256-GCM", key32),
            "AES-256-GCM", "ffffffffffffffffffffffffffffffff",
        ),
    ) is None
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported cipher"):
        vrl.encrypt(F.lit("x"), "ROT13", "k")


def test_parse_ruby_hash(spark):
    v = _one(spark, vrl.parse_ruby_hash(
        F.lit('{ "hello" => "world", :sym => 2, "n" => nil }'),
        "hello string, sym int, n string",
    ))
    assert v["hello"] == "world" and v["sym"] == 2 and v["n"] is None


def test_parse_ruby_hash_rockets_inside_values(spark):
    """The default engine is string-aware: '=>' / ':word =>' / 'nil'
    INSIDE quoted values must survive untouched (the context-free
    regex rewrite corrupted them), and single-quoted Ruby strings
    parse."""
    v = _one(spark, vrl.parse_ruby_hash(
        F.lit('{ "msg" => "a :b => c", "note" => "x => y nil" }'),
        "msg string, note string",
    ))
    assert v["msg"] == "a :b => c"
    assert v["note"] == "x => y nil"

    v2 = _one(spark, vrl.parse_ruby_hash(
        F.lit("{ 'single' => 'it\\'s here', :sym => 'v' }"),
        "single string, sym string",
    ))
    assert v2["single"] == "it's here" and v2["sym"] == "v"

    # bare symbol VALUES become strings
    v3 = _one(spark, vrl.parse_ruby_hash(
        F.lit("{ :state => :active }"), "state string",
    ))
    assert v3["state"] == "active"


def test_parse_etld(spark):
    assert _one(spark, vrl.parse_etld(F.lit("sub.example.co.uk"))) == "co.uk"
    assert _one(spark, vrl.parse_etld(F.lit("sub.example.co.uk"), plus_parts=1)) == "example.co.uk"
    assert _one(spark, vrl.parse_etld(F.lit("www.example.com"))) == "com"
    assert _one(spark, vrl.parse_etld(F.lit("www.example.com"), plus_parts=1)) == "example.com"
    assert _one(spark, vrl.parse_etld(F.lit("user.github.io"))) == "github.io"
    # plus_parts clamped at the hostname length
    assert _one(spark, vrl.parse_etld(F.lit("example.com"), plus_parts=5)) == "example.com"
    assert _one(
        spark, vrl.parse_etld(F.lit("x.internal.corp"), extra=("internal.corp",))
    ) == "internal.corp"


def test_case_conversions(spark):
    assert _one(spark, vrl.snakecase(F.lit("inputFieldName"))) == "input_field_name"
    assert _one(spark, vrl.kebabcase(F.lit("input_field name"))) == "input-field-name"
    assert _one(spark, vrl.camelcase(F.lit("input-field-name"))) == "inputFieldName"
    assert _one(spark, vrl.pascalcase(F.lit("input field_name"))) == "InputFieldName"


def test_parse_apache_and_logfmt_aliases(spark):
    line = ('203.0.113.9 - alice [17/Aug/2026:10:00:00 +0000] '
            '"GET /x HTTP/1.1" 200 512')
    v = _one(spark, vrl.parse_apache_log(F.lit(line)))
    assert v is not None and v["client_ip"] == "203.0.113.9"
    kv = _one(spark, vrl.parse_logfmt(F.lit("a=1 b=two")))
    assert kv == {"a": "1", "b": "two"}


def test_parse_bytes(spark):
    assert _one(spark, vrl.parse_bytes(F.lit("1.5MiB"))) == 1572864
    assert _one(spark, vrl.parse_bytes(F.lit("2kB"))) == 2000
    assert _one(spark, vrl.parse_bytes(F.lit("7B"))) == 7
    assert _one(spark, vrl.parse_bytes(F.lit("nope"))) is None


def test_strip_ansi_and_redact(spark):
    colored = "\x1b[31mred\x1b[0m plain"
    assert _one(spark, vrl.strip_ansi_escape_codes(F.lit(colored))) == "red plain"
    msg = "ssn 123-45-6789 mail a@b.com ip 10.0.0.1"
    out = _one(spark, vrl.redact(
        F.lit(msg), ["us_social_security_number", "email", "ipv4"]))
    assert out == "ssn [REDACTED] mail [REDACTED] ip [REDACTED]"
    # raw regex filter
    assert _one(spark, vrl.redact(F.lit("key=secret123"), [r"secret\w+"])) == \
        "key=[REDACTED]"


def test_encode_logfmt_and_csv(spark):
    m = F.create_map(F.lit("b"), F.lit("two words"), F.lit("a"), F.lit("1"))
    assert _one(spark, vrl.encode_logfmt(m)) == 'a=1 b="two words"'
    # logfmt round-trip through the parser
    rt = _one(spark, vrl.parse_logfmt(vrl.encode_logfmt(
        F.create_map(F.lit("x"), F.lit("9"), F.lit("y"), F.lit("z")))))
    assert rt == {"x": "9", "y": "z"}
    s = F.struct(F.lit("a,b").alias("x"), F.lit(7).alias("n"),
                 F.lit(None).cast("string").alias("z"))
    assert _one(spark, vrl.encode_csv(s, ["x", "n", "z"])) == '"a,b",7,'


def test_type_checks_schema_resolved(spark):
    df = spark.createDataFrame(
        [("x", 1, 1.5, True, [1], {"k": "v"})],
        "s string, i int, f double, b boolean, a array<int>, m map<string,string>",
    )
    assert vrl.is_string(df, "s") and not vrl.is_string(df, "i")
    assert vrl.is_integer(df, "i") and vrl.is_float(df, "f")
    assert vrl.is_boolean(df, "b") and vrl.is_array(df, "a")
    assert vrl.is_object(df, "m")


def test_object_and_array_extras(spark):
    m = F.create_map(F.lit("a"), F.lit("1"), F.lit("b"), F.lit("2"))
    assert sorted(_one(spark, vrl.object_keys(m))) == ["a", "b"]
    arr = F.array(*[F.lit(i) for i in range(5)])
    assert _one(spark, vrl.chunk(arr, 2)) == [[0, 1], [2, 3], [4]]
    assert _one(spark, vrl.chunk(F.array().cast("array<int>"), 2)) == []
    assert _one(spark, vrl.flatten_array(
        F.array(F.array(F.lit(1)), F.array(F.lit(2))))) == [1, 2]


def test_string_number_timestamp_extras(spark):
    assert _one(spark, vrl.repeat(F.lit("ab"), 3)) == "ababab"
    assert _one(spark, vrl.pad_left(F.lit("7"), 3, "0")) == "007"
    assert _one(spark, vrl.find(F.lit("hello"), "ll")) == 2
    assert _one(spark, vrl.find(F.lit("hello"), "zz")) == -1
    assert _one(spark, vrl.format_number(F.lit(1234.567), 2)) == "1,234.57"
    import datetime as _dt
    assert _one(spark, vrl.from_unix_timestamp(F.lit(1767225600))) == \
        _dt.datetime(2026, 1, 1, 0, 0)
    assert _one(spark, vrl.from_unix_timestamp(
        F.lit(1767225600123), "milliseconds")).microsecond == 123000


def test_strftime_format_language(spark):
    """VRL/chrono strftime tokens accepted verbatim — reference configs
    (e.g. enrichment file tables with strftime date formats) migrate
    without rewriting their format strings."""
    import datetime as _dt

    ts = F.lit("2026-08-17 09:05:07").cast("timestamp")
    assert vrl.strftime_to_spark("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss"
    assert vrl.strftime_to_spark("%d/%b/%Y") == "dd/MMM/yyyy"
    assert _one(spark, vrl.format_timestamp(ts, "%Y-%m-%dT%H:%M:%S",
                                            strftime=True)) == \
        "2026-08-17T09:05:07"
    got = _one(spark, vrl.parse_timestamp(
        F.lit("17/Aug/2026:09:05:07"), "%d/%b/%Y:%H:%M:%S", strftime=True))
    assert got == _dt.datetime(2026, 8, 17, 9, 5, 7)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unsupported"):
        vrl.strftime_to_spark("%Q")


def test_ip_aton_ntoa_and_checks(spark):
    assert _one(spark, vrl.ip_aton(F.lit("10.0.0.1"))) == 10 * 16777216 + 1
    assert _one(spark, vrl.ip_ntoa(F.lit(10 * 16777216 + 1))) == "10.0.0.1"
    # round trip
    assert _one(spark, vrl.ip_ntoa(vrl.ip_aton(F.lit("192.168.7.13")))) == \
        "192.168.7.13"
    assert _one(spark, vrl.is_ipv4(F.lit("255.255.255.255"))) is True
    assert _one(spark, vrl.is_ipv4(F.lit("256.1.1.1"))) is False
    assert _one(spark, vrl.is_ipv6(F.lit("2001:db8::1"))) is True
    assert _one(spark, vrl.is_ipv6(F.lit("10.0.0.1"))) is False


def test_punycode(spark):
    assert _one(spark, vrl.encode_punycode(F.lit("bücher.example"))) == \
        "xn--bcher-kva.example"
    assert _one(spark, vrl.decode_punycode(F.lit("xn--bcher-kva.example"))) == \
        "bücher.example"
    assert _one(spark, vrl.encode_punycode(F.lit("plain.example"))) == \
        "plain.example"


def test_syslog_level_converters(spark):
    assert _one(spark, vrl.to_syslog_severity(F.lit("err"))) == 3
    assert _one(spark, vrl.to_syslog_severity(F.lit("error"))) == 3
    assert _one(spark, vrl.to_syslog_severity(F.lit("panic"))) == 0
    assert _one(spark, vrl.to_syslog_severity(F.lit("debug"))) == 7
    assert _one(spark, vrl.to_syslog_severity(F.lit("nope"))) is None
    assert _one(spark, vrl.to_syslog_level(F.lit(6))) == "info"
    assert _one(spark, vrl.to_syslog_facility(F.lit(4))) == "auth"
    assert _one(spark, vrl.to_syslog_facility(F.lit(23))) == "local7"
    assert _one(spark, vrl.to_syslog_facility(F.lit(99))) is None


def test_tally_and_sieve(spark):
    arr = F.array(F.lit("a"), F.lit("b"), F.lit("a"), F.lit("c"), F.lit("a"))
    assert _one(spark, vrl.tally(arr)) == {"a": 3, "b": 1, "c": 1}
    assert _one(spark, vrl.tally_value(arr, "a")) == 3
    assert _one(spark, vrl.tally_value(arr, "z")) == 0
    assert _one(spark, vrl.sieve(F.lit("a1b22c333"), r"\d+")) == "122333"
    assert _one(spark, vrl.sieve(F.lit("a1b2"), r"\d", "-")) == "1-2"


def test_community_id_direction_symmetric(spark):
    fwd = vrl.community_id(F.lit("1.2.3.4"), F.lit("5.6.7.8"),
                           F.lit(1122), F.lit(3344))
    rev = vrl.community_id(F.lit("5.6.7.8"), F.lit("1.2.3.4"),
                           F.lit(3344), F.lit(1122))
    a, b = _one(spark, fwd), _one(spark, rev)
    assert a == b and a.startswith("1:") and len(a) > 20
    # different flows → different ids
    other = _one(spark, vrl.community_id(F.lit("1.2.3.4"), F.lit("5.6.7.8"),
                                         F.lit(1122), F.lit(3345)))
    assert other != a
    # deterministic
    assert _one(spark, fwd) == a
    # python-side reference implementation agrees (spec re-derivation)
    import base64
    import hashlib
    import socket
    import struct

    payload = (
        struct.pack("!H", 0)
        + socket.inet_aton("1.2.3.4") + socket.inet_aton("5.6.7.8")
        + struct.pack("!BB", 6, 0) + struct.pack("!HH", 1122, 3344)
    )
    want = "1:" + base64.b64encode(hashlib.sha1(payload).digest()).decode()
    assert a == want


def test_parse_linux_authorization(spark):
    line = ("<86>Jan 17 07:45:01 box sshd[991]: Accepted publickey for "
            "root from 10.0.0.9")
    v = _one(spark, vrl.parse_linux_authorization(F.lit(line)))
    assert v["appname"] == "sshd" and v["procid"] == 991
    assert v["message"].startswith("Accepted publickey")


def test_parse_syslog_5424(spark):
    line = ('<165>1 2026-08-17T10:00:00Z web01 nginx 1234 ID47 '
            '[exampleSDID@32473 iut="3"] request completed')
    v = _one(spark, vrl.parse_syslog_5424(F.lit(line)))
    assert v["facility"] == 20 and v["severity"] == 5
    assert v["hostname"] == "web01" and v["appname"] == "nginx"
    assert v["procid"] == 1234 and v["msgid"] == "ID47"
    assert v["structured_data"].startswith("[exampleSDID")
    assert v["message"] == "request completed"
    # nil fields
    v2 = _one(spark, vrl.parse_syslog_5424(
        F.lit("<34>1 2026-01-01T00:00:00Z - - - - - hello")))
    assert v2["hostname"] is None and v2["message"] == "hello"
    assert _one(spark, vrl.parse_syslog_5424(F.lit("not syslog"))) is None
    # multiple consecutive SD elements all land in structured_data
    v3 = _one(spark, vrl.parse_syslog_5424(F.lit(
        '<165>1 2026-08-17T10:00:00Z h app 1 ID '
        '[a x="1"][b y="2"] hello')))
    assert v3["structured_data"] == '[a x="1"][b y="2"]'
    assert v3["message"] == "hello"


def test_parse_glog(spark):
    line = "E0817 10:00:00.123456  1234 controller.go:217] sync failed"
    v = _one(spark, vrl.parse_glog(F.lit(line)))
    assert v["level"] == "error" and v["month"] == 8 and v["day"] == 17
    assert v["id"] == 1234 and v["file"] == "controller.go"
    assert v["line"] == 217 and v["message"] == "sync failed"
    assert vrl.parse_klog is vrl.parse_glog
    assert _one(spark, vrl.parse_glog(F.lit("plain text"))) is None


def test_base64url_round_trip(spark):
    # payload chosen to produce +/ and padding in standard base64
    payload = "\xfb\xff~a"
    std = _one(spark, vrl.encode_base64(F.lit(payload)))
    url = _one(spark, vrl.encode_base64url(F.lit(payload)))
    assert "+" not in url and "/" not in url and not url.endswith("=")
    assert _one(spark, vrl.decode_base64url(F.lit(url))) == payload
    # std and url encode the same bytes
    assert std.replace("+", "-").replace("/", "_").rstrip("=") == url


def test_get_path_and_map_contains(spark):
    nested = F.struct(
        F.array(
            F.struct(F.create_map(F.lit("k"), F.lit("v")).alias("attrs"))
        ).alias("items")
    )
    assert _one(spark, vrl.get_path(nested, ["items", 0, "attrs", "k"])) == "v"
    m = F.create_map(F.lit("a"), F.lit("1"))
    assert _one(spark, vrl.map_contains_key(m, "a")) is True
    assert _one(spark, vrl.map_contains_key(m, "z")) is False


def test_secrets_map_functions(spark):
    """get/set/remove_secret over the event secrets map column
    (lib/vector-vrl/functions): upsert replaces, remove drops, get on
    absent key is null, and a null map is treated as empty."""
    df = spark.createDataFrame(
        [({"token": "t1"},), (None,)],
        "secrets map<string,string>",
    )
    s = F.col("secrets")
    rows = df.select(
        vrl.get_secret(s, "token").alias("got"),
        vrl.set_secret(s, "token", "t2").alias("upserted"),
        vrl.set_secret(s, "extra", F.lit("x")).alias("added"),
        vrl.remove_secret(s, "token").alias("removed"),
    ).collect()
    assert rows[0]["got"] == "t1"
    assert rows[0]["upserted"] == {"token": "t2"}
    assert rows[0]["added"] == {"token": "t1", "extra": "x"}
    assert rows[0]["removed"] == {}
    assert rows[1]["got"] is None
    assert rows[1]["upserted"] == {"token": "t2"}
    assert rows[1]["removed"] == {}


def test_semantic_meaning_registry(spark):
    reg = {}
    vrl.set_semantic_meaning("message", "text", registry=reg)
    df = spark.createDataFrame([("hello",)], "text string")
    [r] = df.select(vrl.semantic_col("message", registry=reg).alias("m")).collect()
    assert r["m"] == "hello"
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not defined"):
        vrl.semantic_col("nope", registry=reg)


# ---------------------------------------------------------------------------
# syslog / GELF encoders (encoding/format/syslog.rs, gelf.rs)


def _ts(spark, s):
    return F.to_timestamp(F.lit(s))


def test_encode_syslog_5424_exact(spark):
    line = _one(spark, vrl.encode_syslog(
        F.lit("hi there"),
        facility=F.lit("local4"), severity=F.lit("warn"),
        app_name=F.lit("myapp"), proc_id=F.lit("42"), msg_id=F.lit("ID7"),
        hostname=F.lit("host1"), timestamp=_ts(spark, "2025-08-28 12:34:56.789"),
        structured_data=F.create_map(
            F.lit("ex@mple"), F.create_map(
                F.lit("k"), F.lit('va"l\\x'), F.lit("a"), F.lit("1"),
            ),
        ),
    ))
    # local4=20, warn→4 (strum alias) → PRI 164; SD params sorted;
    # value escaping: backslash then quote
    assert line == ('<164>1 2025-08-28T12:34:56.789000Z host1 myapp 42 ID7 '
                    '[ex@mple a="1" k="va\\"l\\\\x"] hi there')


def test_encode_syslog_5424_nils_and_empty_message(spark):
    line = _one(spark, vrl.encode_syslog(
        F.lit(""), timestamp=_ts(spark, "2025-08-28 00:00:00"),
    ))
    # defaults user(1)/informational(6) → PRI 14; app default "vector";
    # NIL hostname/procid/msgid/SD; empty message → NO trailing space
    assert line == "<14>1 2025-08-28T00:00:00.000000Z - vector - - -"


def test_encode_syslog_5424_truncation(spark):
    line = _one(spark, vrl.encode_syslog(
        F.lit("m"), app_name=F.lit("x" * 60), msg_id=F.lit("y" * 40),
        timestamp=_ts(spark, "2025-08-28 00:00:00"),
    ))
    parts = line.split(" ")
    # <pri>1 TS HOST APP PROCID MSGID SD msg — hostname is NIL here
    assert parts[3] == "x" * 48   # app truncated to 48 chars
    assert parts[5] == "y" * 32   # msgid truncated to 32 chars


def test_encode_syslog_3164_exact(spark):
    line = _one(spark, vrl.encode_syslog(
        F.lit("boot éok"), rfc="rfc3164",
        facility=F.lit(9), severity=F.lit("err"),
        app_name=F.lit("appé"), proc_id=F.lit("7"),
        hostname=F.lit("h2"), timestamp=_ts(spark, "2025-09-05 01:02:03"),
    ))
    # cron(9)*8+err(3)=75; %e day is space-padded; non-ASCII → '_' in
    # the tag, ' ' in the message (sanitize_rfc3164_message)
    assert line == "<75>Sep  5 01:02:03 h2 app_[7]: boot  ok"


def test_encode_syslog_3164_tag_truncation(spark):
    line = _one(spark, vrl.encode_syslog(
        F.lit("m"), rfc="rfc3164", app_name=F.lit("a" * 40),
        timestamp=_ts(spark, "2025-09-05 01:02:03"),
    ))
    # "Sep  5" double space splits into an empty part; tag is index 5
    tag = line.split(" ")[5]
    assert len(tag) == 32 and tag.endswith(":") and tag[:31] == "a" * 31


def test_encode_syslog_code_fallbacks(spark):
    # unknown name → defaults; numeric codes pass through; out-of-range
    # numeric → default
    for fac, sev, pri in [("nope", "nope", 14), (23, 0, 184), (99, 9, 14)]:
        line = _one(spark, vrl.encode_syslog(
            F.lit("m"), facility=F.lit(fac), severity=F.lit(sev),
            timestamp=_ts(spark, "2025-08-28 00:00:00"),
        ))
        assert line.startswith(f"<{pri}>"), (fac, sev, line)


def test_encode_gelf_exact_and_timestamp_branches(spark):
    import json

    g = _one(spark, vrl.encode_gelf(
        F.lit("host1"), F.lit('hi "there"'),
        timestamp=_ts(spark, "2025-08-28 12:34:56.789"),
        level=F.lit(4), full_message=F.lit("long"),
        additional={"conv.id": F.lit("c-1"), "_n": F.lit(3)},
    ))
    # sorted keys, '_' prefix prepended, float timestamp branch
    assert g == ('{"_conv.id":"c-1","_n":3,"full_message":"long",'
                 '"host":"host1","level":4,"short_message":"hi \\"there\\"",'
                 '"timestamp":1756384496.789,"version":"1.1"}')
    g2 = json.loads(_one(spark, vrl.encode_gelf(
        F.lit("h"), F.lit("m"), timestamp=_ts(spark, "2025-08-28 00:00:05"),
    )))
    # whole-second → integer timestamp (gelf.rs int-vs-float branch)
    assert g2["timestamp"] == 1756339205 and isinstance(g2["timestamp"], int)


def test_encode_gelf_errors(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="invalid GELF"):
        vrl.encode_gelf(F.lit("h"), F.lit("m"), additional={"bad name": F.lit(1)})
    # NULL host → NULL line (serializer error convention)
    assert _one(spark, vrl.encode_gelf(
        F.lit(None).cast("string"), F.lit("m"))) is None
    # non-integer level → field dropped, line still valid
    import json
    g = json.loads(_one(spark, vrl.encode_gelf(
        F.lit("h"), F.lit("m"), level=F.lit("warn"))))
    assert "level" not in g and g["version"] == "1.1"


def test_encode_syslog_reference_test_vectors(spark):
    """The reference's own encoder test expectations, byte for byte
    (encoding/format/syslog.rs tests: test_rfc5424_defaults,
    test_rfc5424_all_fields, test_rfc3164_all_fields)."""
    ts = F.to_timestamp(F.lit("2025-08-28 18:30:00.123456"))
    # defaults: user/informational, app "vector", NILs
    assert _one(spark, vrl.encode_syslog(
        F.lit("original message"),
        hostname=F.lit("test-host.com"), timestamp=ts,
    )) == ("<14>1 2025-08-28T18:30:00.123456Z test-host.com vector "
           "- - - original message")
    # all fields: daemon(3)*8 + critical(2) = 26, SD from nested object
    all_fields = dict(
        facility=F.lit("daemon"), severity=F.lit(2),
        app_name=F.lit("my-app"), proc_id=F.lit("12345"),
        msg_id=F.lit("req-abc-789"), hostname=F.lit("test-host.com"),
        timestamp=ts,
    )
    assert _one(spark, vrl.encode_syslog(
        F.lit("original message"),
        structured_data=F.create_map(
            F.lit("metrics"), F.create_map(F.lit("retries"), F.lit("3"))),
        **all_fields,
    )) == ('<26>1 2025-08-28T18:30:00.123456Z test-host.com my-app '
           '12345 req-abc-789 [metrics retries="3"] original message')
    # rfc3164 drops structured data and msgid
    assert _one(spark, vrl.encode_syslog(
        F.lit("original message"), rfc="rfc3164", **all_fields,
    )) == "<26>Aug 28 18:30:00 test-host.com my-app[12345]: original message"
    # get_syslog_code parsing logic: names any case, aliases, digits
    for fac, sev, pri in [("daemon", "critical", 26), ("DAEMON", "CRIT", 26),
                          (3, 2, 26), ("daemon", "panic", 24),
                          ("daemon", "warn", 28)]:
        line = _one(spark, vrl.encode_syslog(
            F.lit("m"), facility=F.lit(fac), severity=F.lit(sev),
            timestamp=ts))
        assert line.startswith(f"<{pri}>"), (fac, sev, line)


def test_encode_gelf_reference_test_vectors(spark):
    """Behavioral assertions from the reference's encoder tests
    (encoding/format/gelf.rs: gelf_serializing_valid / _coerced /
    _timestamp): core fields pass through, missing-underscore
    additional fields get prefixed, numbers stay numbers, and the
    sub-second epoch renders as a float."""
    import json

    g = json.loads(_one(spark, vrl.encode_gelf(
        F.lit("example.org"), F.lit("Some message"),
        full_message=F.lit("Even more message"),
        file=F.lit("/tmp/foobar"), line=F.lit(1.5), level=F.lit(5),
    )))
    assert g["version"] == "1.1" and g["host"] == "example.org"
    assert g["short_message"] == "Some message"
    assert g["full_message"] == "Even more message"
    assert g["line"] == 1.5 and g["level"] == 5
    g2 = json.loads(_one(spark, vrl.encode_gelf(
        F.lit("example.org"), F.lit("Some message"),
        additional={"noUnderScore": F.lit(0)},
    )))
    assert g2["_noUnderScore"] == 0 and "noUnderScore" not in g2
    # sub-second epoch → float (gelf_serializing_timestamp)
    g3 = json.loads(_one(spark, vrl.encode_gelf(
        F.lit("h"), F.lit("m"),
        timestamp=F.to_timestamp(F.lit("1970-01-01 00:00:00.1")),
    )))
    assert g3["timestamp"] == 0.1
