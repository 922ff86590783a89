"""Parse stage: jvm engine ≡ pandas engine ≡ DuckDB oracle (FIXTURES F1a)."""

from __future__ import annotations

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
