"""Parse stage: jvm engine ≡ pandas engine ≡ DuckDB oracle (FIXTURES F1a)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_frames_match
from vector_spark.data.oracles import parsed_cte
from vector_spark.data.transcripts import transcripts_df
from vector_spark.functions.grok import grok_to_regex
from vector_spark.functions.parse import parse_transcripts, split_errors

N = 6000


def _flatten(df):
    return df.select("conv_id", "turn_idx", "format", "parsed.*", "parse_ok")


def test_grok_compiler():
    regex, fields = grok_to_regex("%{IP:ip} - %{WORD:verb} %{INT:n}")
    assert fields == ["ip", "verb", "n"]
    import re

    m = re.match(f"^{regex}$", "1.2.3.4 - GET 42")
    assert m and m.groups() == ("1.2.3.4", "GET", "42")


def test_grok_base_set_composites():
    """The logstash base set: composite patterns expand recursively
    with fields in capture-group order, and every shipped pattern
    compiles to a valid plain regex (Java/RE2-safe subset)."""
    import re

    from vector_spark.functions.grok import (
        GROK_PATTERNS, GrokError, grok_field_types,
    )

    rx, fields = grok_to_regex("%{COMBINEDAPACHELOG}")
    line = ('10.0.0.1 - bob [17/Aug/2026:10:00:00 +0000] '
            '"POST /api/v1?x=2 HTTP/1.1" 503 1234 '
            '"http://ref.example/" "curl/8.0"')
    m = re.match(f"^{rx}$", line)
    assert m
    got = dict(zip(fields, m.groups()))
    assert got["clientip"] == "10.0.0.1" and got["auth"] == "bob"
    assert got["verb"] == "POST" and got["request"] == "/api/v1?x=2"
    assert got["response"] == "503" and got["bytes"] == "1234"
    assert got["referrer"] == '"http://ref.example/"'  # QS keeps quotes

    rx2, f2 = grok_to_regex("%{SYSLOGLINE}")
    m2 = re.match(f"^{rx2}$",
                  "Aug 17 10:00:00 web01 sshd[991]: Accepted publickey")
    got2 = dict(zip(f2, m2.groups()))
    assert got2["logsource"] == "web01" and got2["program"] == "sshd"
    assert got2["pid"] == "991" and got2["message"] == "Accepted publickey"

    rx3, _ = grok_to_regex("%{URI:u}")
    assert re.match(f"^{rx3}$", "https://user@host.example:8443/p/x?a=1")

    # every shipped pattern compiles standalone
    for name in GROK_PATTERNS:
        re.compile(grok_to_regex("%{" + name + ":x}")[0])

    # type annotations and duplicate-field disambiguation
    assert grok_field_types("%{NUMBER:bytes:int} %{WORD:w}") == {"bytes": "int"}
    _, dup = grok_to_regex("%{WORD:w} %{WORD:w}")
    assert dup[0] == "w" and dup[1] != "w"

    with pytest.raises(GrokError, match="unknown grok pattern"):
        grok_to_regex("%{NO_SUCH_PATTERN:x}")

    # recursion bound: a self-referencing pattern fails loudly
    GROK_PATTERNS["_SELF"] = "%{_SELF}"
    try:
        with pytest.raises(GrokError, match="recursion"):
            grok_to_regex("%{_SELF}")
    finally:
        del GROK_PATTERNS["_SELF"]


def test_jvm_matches_oracle(spark, ddb):
    df = _flatten(parse_transcripts(transcripts_df(spark, N)))
    sql = parsed_cte(N) + "\nSELECT conv_id, turn_idx, format, client_ip, username, log_time, http_method, http_url, http_status, http_bytes, level, msg, latency_ms, service, code, retry, parse_ok FROM parsed"
    assert_frames_match(df, ddb.sql(sql))


def test_pandas_engine_matches_jvm(spark):
    base = transcripts_df(spark, N)
    a = _flatten(parse_transcripts(base, engine="jvm"))
    b = _flatten(parse_transcripts(base, engine="pandas"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_error_channel(spark):
    df = parse_transcripts(transcripts_df(spark, N))
    ok, dropped = split_errors(df)
    n = df.count()
    assert ok.count() + dropped.count() == n
    # all dropped rows are the garbage format and carry drop metadata
    assert dropped.filter(~F.col("text").startswith("~~#")).count() == 0
    assert dropped.columns[-2:] == ["_dropped_reason", "_dropped_component"]
    # no parsed rows lost fields: every ok row has a format
    assert ok.filter(F.col("format").isNull()).count() == 0
