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


def test_exactly_once_table_sink(spark, stream_src, tmp_path):
    """foreachBatch -> SnapshotTable: every micro-batch committed once;
    a replayed batch id is skipped."""
    from vector_spark.sources.table import SnapshotTable
    from vector_spark.streaming.pipeline import write_stream_to_table

    tbl = SnapshotTable(spark, str(tmp_path / "tbl"))
    stream = stream_transcripts(spark, stream_src, max_files_per_trigger=1)
    write_stream_to_table(stream.filter("turn_idx = 0"), tbl)
    expected = spark.read.parquet(stream_src).filter("turn_idx = 0").count()
    assert tbl.read().count() == expected
    hist = tbl.history()
    assert len(hist) >= 2  # several micro-batches
    batch_ids = [h["batch_id"] for h in hist]
    assert len(batch_ids) == len(set(batch_ids))
    # replay simulation: committing a duplicate batch id is a no-op
    before = tbl.read().count()
    from vector_spark.streaming.pipeline import write_stream_to_table as _w
    # re-run the same stream from scratch: same batch ids -> all skipped
    stream2 = stream_transcripts(spark, stream_src, max_files_per_trigger=1)
    _w(stream2.filter("turn_idx = 0"), tbl)
    assert tbl.read().count() == before


def test_turn_order_stable_under_repartition(spark, stream_src):
    """Per-turn concat is bit-identical regardless of physical
    partitioning (the Window over (conv_id, turn_idx) guarantee)."""
    from vector_spark.operators.reduce import reduce_events

    base = spark.read.parquet(stream_src)
    variants = [base, base.repartition(3), base.repartition(17, "role"),
                base.repartitionByRange(5, "ts")]
    outs = []
    for v in variants:
        out = reduce_events(
            v, ["conv_id"],
            {"all_text": ("concat_newline", "text")},
            timestamps=False,
        )
        outs.append(sorted((r["conv_id"], r["all_text"]) for r in out.collect()))
    assert outs[0] == outs[1] == outs[2] == outs[3]


def test_stream_built_memory_table_equals_batch_built(spark, stream_src):
    """Streaming micro-batches write the memory enrichment table; the
    resulting TTL/last-write-wins state must equal the state built from
    the same rows in one batch write."""
    import shutil as _shutil

    from vector_spark.operators.memory_table import MemoryTable
    from vector_spark.streaming.pipeline import write_stream_to_memory_table

    d1, d2 = "/tmp/vs_memtbl_stream", "/tmp/vs_memtbl_batch"
    for d in (d1, d2):
        _shutil.rmtree(d, ignore_errors=True)
    try:
        cols = ["role", "tool", "ts", "conv_id", "turn_idx"]
        stream = stream_transcripts(
            spark, stream_src, max_files_per_trigger=1
        ).select(*cols)
        t_stream = MemoryTable(spark, d1, ["role"], ttl_sec=10**9,
                               tiebreak_cols=["conv_id", "turn_idx"])
        write_stream_to_memory_table(stream, t_stream)
        assert len(t_stream._table.history()) > 1  # several micro-batches

        batch = spark.read.parquet(stream_src).select(*cols)
        t_batch = MemoryTable(spark, d2, ["role"], ttl_sec=10**9,
                              tiebreak_cols=["conv_id", "turn_idx"])
        t_batch.write(batch)

        as_of = batch.agg(F.max("ts")).first()[0]
        s1 = {tuple(r) for r in t_stream.state(F.lit(as_of))
              .select("role", "tool", "conv_id", "turn_idx").collect()}
        s2 = {tuple(r) for r in t_batch.state(F.lit(as_of))
              .select("role", "tool", "conv_id", "turn_idx").collect()}
        assert s1 == s2 and len(s1) > 0
    finally:
        for d in (d1, d2):
            _shutil.rmtree(d, ignore_errors=True)


def test_stream_dedupe_matches_batch(spark, stream_src):
    from vector_spark.streaming import stream_dedupe, stream_transcripts

    # duplicate the stream source rows by reading it twice via union
    dup_src = "/tmp/vs_stream_dup_src"
    import shutil as _sh

    _sh.rmtree(dup_src, ignore_errors=True)
    try:
        base = spark.read.parquet(stream_src)
        base.unionByName(base.limit(3000)).repartition(4).write.parquet(dup_src)
        stream = stream_transcripts(spark, dup_src)
        sdf = stream_dedupe(stream, ["conv_id", "turn_idx"])
        run_to_memory(sdf, "stream_dedup", output_mode="append")
        got = spark.sql(
            "SELECT count(*) AS n, count(DISTINCT conv_id || '#' || turn_idx)"
            " AS d FROM stream_dedup"
        ).first()
        assert got["n"] == got["d"] == 6000  # every turn exactly once
    finally:
        _sh.rmtree(dup_src, ignore_errors=True)


def test_stream_delay_event_time_release(spark, tmp_path):
    """delay as a streaming operator: an event releases only after the
    watermark passes ts + delay.  Two micro-batches, 60 s delay: batch
    1's events (t0..t0+3s) must NOT appear until batch 2 (t0+120s..)
    advances the watermark past their release times; the stream's tail
    (batch 2 itself) stays buffered at end-of-input."""
    import datetime as dt

    from vector_spark.streaming.pipeline import stream_delay

    src = str(tmp_path / "delay_src")
    t0 = dt.datetime(2026, 1, 1)
    batch1 = spark.createDataFrame(
        [("k", i, t0 + dt.timedelta(seconds=i)) for i in range(4)],
        "key string, i int, ts timestamp",
    )
    batch2 = spark.createDataFrame(
        [("k", 100 + i, t0 + dt.timedelta(seconds=120 + i)) for i in range(2)],
        "key string, i int, ts timestamp",
    )
    batch1.coalesce(1).write.parquet(src)
    batch2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("key string, i int, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_delay(stream, delay_sec=60, key="key")
    run_to_memory(out, "stream_delay", output_mode="append")
    got = sorted(r["i"] for r in spark.sql("SELECT * FROM stream_delay").collect())
    # batch-1 events release once the watermark (driven by batch 2's
    # t0+121s max) passes ts+60s; batch-2 events' release times are
    # beyond the final watermark → still buffered
    assert got == [0, 1, 2, 3]


def test_stream_delay_overflow_modes(spark, tmp_path):
    import datetime as dt

    from vector_spark.streaming.pipeline import stream_delay

    t0 = dt.datetime(2026, 1, 1)
    rows = [("k", i, t0 + dt.timedelta(seconds=i)) for i in range(6)]

    for mode, expected in (("forward", [0, 1, 2, 3, 4, 5]), ("drop_newest", [])):
        src = str(tmp_path / f"delay_{mode}")
        spark.createDataFrame(
            rows, "key string, i int, ts timestamp"
        ).coalesce(1).write.parquet(src)
        stream = (
            spark.readStream.schema("key string, i int, ts timestamp")
            .parquet(src)
        )
        # delay far beyond the data range: nothing releases by time...
        out = stream_delay(
            stream, delay_sec=3600, key="key",
            max_events=2, when_full=mode,
        )
        run_to_memory(out, f"stream_delay_{mode}", output_mode="append")
        got = sorted(
            r["i"]
            for r in spark.sql(f"SELECT * FROM stream_delay_{mode}").collect()
        )
        if mode == "forward":
            # first 2 buffered forever, the other 4 forwarded when full
            assert got == [2, 3, 4, 5]
        else:
            # first 2 buffered, the rest dropped: nothing emitted
            assert got == []


def test_stream_octet_framing_matches_batch(spark, tmp_path):
    """Framing is a stateless projection, so it must behave identically
    under Structured Streaming: octet-framed payload files read as a
    stream produce exactly the batch result."""
    from pyspark.sql import functions as F

    from vector_spark.sources.readers import octet_encode, octet_frames

    src = str(tmp_path / "frames_src")
    msgs = [f"message number {i}" for i in range(20)]
    payloads = spark.createDataFrame(
        [(i, m) for i, m in enumerate(msgs)], "i int, msg string"
    ).groupBy((F.col("i") % 3).alias("file_no")).agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("i", octet_encode(F.col("msg")).alias("f")))
                ),
                lambda x: x["f"],
            ),
        ).alias("payload")
    )
    payloads.coalesce(1).write.parquet(src)

    def frames(df):
        return df.select(
            F.explode(octet_frames(F.col("payload"))).alias("message")
        )

    batch = sorted(r["message"] for r in frames(spark.read.parquet(src)).collect())
    stream = spark.readStream.schema("file_no int, payload string").parquet(src)
    run_to_memory(frames(stream), "stream_frames", output_mode="append")
    got = sorted(
        r["message"] for r in spark.sql("SELECT * FROM stream_frames").collect()
    )
    assert got == batch == sorted(msgs)


def test_stream_throttle_state_spans_batches(spark, tmp_path):
    """Token-bucket state must persist across micro-batches: a key's
    budget consumed in batch 1 stays consumed in batch 2 for the same
    window (a per-batch window op would re-admit)."""
    import datetime as dt

    from vector_spark.streaming.pipeline import stream_throttle

    src = str(tmp_path / "thr_src")
    t0 = dt.datetime(2026, 1, 1)
    # two files = two micro-batches; SAME window for key 'k'
    batch1 = spark.createDataFrame(
        [("k", i, t0 + dt.timedelta(seconds=i)) for i in range(4)],
        "key string, i int, ts timestamp",
    )
    batch2 = spark.createDataFrame(
        [("k", 10 + i, t0 + dt.timedelta(seconds=30 + i)) for i in range(4)],
        "key string, i int, ts timestamp",
    )
    batch1.coalesce(1).write.parquet(src)
    batch2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("key string, i int, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_throttle(stream, threshold=5, window_sec=600, key="key")
    run_to_memory(out, "stream_throttle", output_mode="append")
    got = spark.sql("SELECT * FROM stream_throttle").collect()
    # 8 events total in ONE window, threshold 5 → exactly 5 admitted
    assert len(got) == 5


def test_stream_otlp_equals_batch(spark, tmp_path):
    """Streaming OTLP file tail produces exactly the batch flatten's
    rows over the same files (stream == batch, the suite's standing
    equality contract)."""
    from tests.test_otlp import LOGS_REQ
    from vector_spark.sources.otlp import otlp_log_records
    from vector_spark.streaming.pipeline import (
        run_to_memory, stream_otlp_log_records,
    )

    d = tmp_path / "otlp_stream"
    d.mkdir()
    for i in range(3):
        (d / f"req{i}.pb").write_bytes(LOGS_REQ)
    sdf = stream_otlp_log_records(spark, str(d), max_files_per_trigger=1)
    assert sdf.isStreaming
    run_to_memory(sdf.select("body", "severity_text", "trace_id"),
                  "otlp_stream_t", output_mode="append")
    got = spark.sql("SELECT * FROM otlp_stream_t").collect()
    batch = otlp_log_records(
        spark.read.format("binaryFile").load(str(d))
    ).select("body", "severity_text", "trace_id").collect()
    key = lambda r: (r["body"], r["severity_text"], r["trace_id"])
    assert sorted(map(key, got)) == sorted(map(key, batch))
    assert len(got) == 6  # 2 records x 3 files


def test_stream_avro_equals_batch(spark, tmp_path):
    import json as _json

    from vector_spark.sources.avro import read_avro, write_container
    from vector_spark.streaming.pipeline import run_to_memory, stream_avro

    sch = _json.dumps({
        "type": "record", "name": "E",
        "fields": [{"name": "k", "type": "string"},
                   {"name": "v", "type": "long"}],
    })
    d = tmp_path / "avro_stream"
    d.mkdir()
    for i in range(3):
        (d / f"f{i}.avro").write_bytes(write_container(
            sch, [{"k": f"k{i}_{j}", "v": i * 10 + j} for j in range(4)]))
    sdf = stream_avro(spark, str(d), sch, max_files_per_trigger=1)
    assert sdf.isStreaming
    run_to_memory(sdf, "avro_stream_t", output_mode="append")
    got = {(r["k"], r["v"])
           for r in spark.sql("SELECT * FROM avro_stream_t").collect()}
    batch = {(r["k"], r["v"])
             for r in read_avro(spark, str(d)).collect()}
    assert got == batch and len(got) == 12
