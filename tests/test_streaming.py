"""Structured Streaming: stream results == batch results on the same
input; session windows; cross-batch state."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from vector_spark.data.transcripts import transcripts_table
from vector_spark.plans.transcript_pipeline import pipeline_stats
from vector_spark.streaming import (
    run_to_memory,
    session_reduce_stream,
    stateful_running_count,
    stream_transcripts,
    streaming_sink_stats,
)

SRC = "/tmp/vector_spark_test_stream_src"


@pytest.fixture
def stream_src(spark):
    shutil.rmtree(SRC, ignore_errors=True)
    t = transcripts_table(spark, 6000)
    # several files => several micro-batches with maxFilesPerTrigger=1
    t.repartition(4).write.parquet(SRC)
    yield SRC
    shutil.rmtree(SRC, ignore_errors=True)


def test_streaming_stats_match_batch(spark, stream_src):
    stream = stream_transcripts(spark, stream_src)
    sdf = streaming_sink_stats(spark, stream, interval_sec=60)
    run_to_memory(sdf, "stream_stats", output_mode="complete")
    got = {
        (r["sink"], r["window_start"]): (r["n"], r["sum_bytes"], r["sum_latency"])
        for r in spark.sql("SELECT * FROM stream_stats").collect()
    }
    batch = pipeline_stats(spark, spark.read.parquet(stream_src)).collect()
    want = {
        (r["sink"], r["window_start"]): (r["n"], r["sum_bytes"], r["sum_latency"])
        for r in batch
    }
    assert got == want


def test_session_window_stream(spark, stream_src):
    stream = stream_transcripts(spark, stream_src)
    sdf = session_reduce_stream(stream, gap_sec=600)
    run_to_memory(sdf, "stream_sessions", output_mode="complete")
    sess = spark.sql("SELECT * FROM stream_sessions")
    # session totals cover every turn exactly once
    total = sess.agg(F.sum("n_turns")).collect()[0][0]
    assert total == 6000
    # sessions respect the gap: batch sessionize agrees on session count
    from vector_spark.operators.reduce import sessionize

    batch_sessions = (
        sessionize(spark.read.parquet(stream_src), ["conv_id"], gap_sec=600)
        .select("conv_id", "session_id")
        .distinct()
        .count()
    )
    assert sess.count() == batch_sessions


def test_stateful_running_count_across_batches(spark, stream_src):
    stream = stream_transcripts(spark, stream_src, max_files_per_trigger=1)
    sdf = stateful_running_count(stream, key="role")
    run_to_memory(sdf, "stream_state", output_mode="update")
    out = spark.sql("SELECT * FROM stream_state").collect()
    # multiple micro-batches happened, state accumulated monotonically
    per_role: dict[str, list] = {}
    for r in out:
        per_role.setdefault(r["role"], []).append(
            (r["batch_rows"], r["running_total"])
        )
    totals = spark.read.parquet(stream_src).groupBy("role").count().collect()
    want = {r["role"]: r["count"] for r in totals}
    for role, seq in per_role.items():
        assert len(seq) >= 2, "expected several micro-batches"
        assert max(t for _, t in seq) == want[role]
        assert sum(b for b, _ in seq) == want[role]
