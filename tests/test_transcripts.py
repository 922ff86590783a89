"""Cross-engine parity of the synthetic transcripts generator + shape
invariants (FIXTURES.md F1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import assert_frames_match
from vector_spark.data.transcripts import (
    duckdb_transcripts_sql,
    spark_transcripts_sql,
    transcripts_df,
)
from vector_spark.data.lookup import TOOL_LOOKUP_SQL, TOOL_LOOKUP_DUCKDB_SQL

N = 6000


def test_generator_matches_duckdb(spark, ddb):
    sdf = spark.sql(spark_transcripts_sql(N))
    rel = ddb.sql(duckdb_transcripts_sql(N))
    assert_frames_match(sdf, rel)


def test_schema(spark):
    df = transcripts_df(spark, 1000)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("conv_id", "string"),
        ("turn_idx", "int"),
        ("role", "string"),
        ("text", "string"),
        ("tool", "string"),
        ("ts", "timestamp"),
    ]


def test_turn_contiguity_and_skew(spark):
    df = transcripts_df(spark, N).cache()
    # turn_idx contiguous 0..len-1 per conv
    bad = (
        df.groupBy("conv_id")
        .agg(F.count("*").alias("n"), F.max("turn_idx").alias("mx"),
             F.min("turn_idx").alias("mn"))
        .filter((F.col("mx") != F.col("n") - 1) | (F.col("mn") != 0))
        .count()
    )
    assert bad == 0
    # hot-conversation skew: top 1% of convs own >= 20% of turns
    counts = df.groupBy("conv_id").count()
    total = df.count()
    n_convs = counts.count()
    top = (
        counts.orderBy(F.desc("count"))
        .limit(max(1, n_convs // 100))
        .agg(F.sum("count"))
        .collect()[0][0]
    )
    assert top / total >= 0.20, f"skew too weak: {top}/{total}"
    df.unpersist()


def test_text_format_mix(spark):
    df = transcripts_df(spark, N)
    n = df.count()
    apache = df.filter(F.col("text").rlike(r"^10\.\d+\.\d+\.\d+ - ")).count()
    js = df.filter(F.col("text").startswith('{"level"')).count()
    logfmt = df.filter(F.col("text").startswith("level=")).count()
    garbage = df.filter(F.col("text").startswith("~~#")).count()
    assert apache + js + logfmt + garbage == n
    assert 0.5 < apache / n < 0.7
    assert 0.15 < js / n < 0.35
    assert 0.05 < logfmt / n < 0.15
    assert 0.01 < garbage / n < 0.10


def test_tool_lookup_parity(spark, ddb):
    sdf = spark.sql(TOOL_LOOKUP_SQL)
    rel = ddb.sql(TOOL_LOOKUP_DUCKDB_SQL)
    assert_frames_match(sdf, rel)
    assert sdf.count() == 20
    assert sdf.select("tool", "role").distinct().count() == 20
