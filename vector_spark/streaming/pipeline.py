"""Structured Streaming variants of the pipeline.

The reference is a streaming engine with PROCESSING-time flushes
(aggregate interval ticks, reduce staleness polls — SURVEY §2.8); the
Spark re-expression uses event-time windows + watermarks, which is
strictly stronger (deterministic, late-data-aware — the reference
merges late events only if their group is still open).

Mapping:
- source checkpoints (file fingerprints / kafka offsets,
  lib/file-source-common/src/checkpointer.rs:44-60) → readStream
  source offsets + checkpointLocation
- aggregate interval_ms flush → window(ts, interval) + watermark
- reduce expire_after_ms session flush → session_window(ts, gap)
- stateful Task transforms → applyInPandasWithState
- acked delivery → foreachBatch + idempotent table commit
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def stream_transcripts(
    spark: SparkSession,
    source_dir: str,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def streaming_sink_stats(
    spark: SparkSession,
    stream: DataFrame,
    *,
    interval_sec: int = 60,
    watermark: str = "10 minutes",
) -> DataFrame:
    """The parse→enrich→route-tag→windowed-agg DAG over a stream —
    identical operators to plans.transcript_pipeline.pipeline_stats,
    with an event-time watermark bounding state."""
    from vector_spark.data.lookup import tool_lookup_df
    from vector_spark.enrich import enrich
    from vector_spark.functions.parse import parse_transcripts
    from vector_spark.operators.route import route_tag_column
    from vector_spark.plans.transcript_pipeline import FLAT_COLS, ROUTES

    parsed = parse_transcripts(stream)
    enriched = enrich(parsed, tool_lookup_df(spark), ["tool", "role"], strict=False)
    flat = enriched.select(*FLAT_COLS, "format", "parse_ok", "parsed.*")
    tags = F.when(
        F.col("parse_ok"), route_tag_column(ROUTES, reroute_unmatched=True)
    ).otherwise(F.array(F.lit("_dropped")))
    exploded = flat.withColumn("sink", F.explode(tags))
    return (
        exploded.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{interval_sec} seconds"), F.col("sink"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("http_bytes").alias("sum_bytes"),
            F.sum("latency_ms").alias("sum_latency"),
            F.approx_count_distinct("conv_id").alias("n_convs_approx"),
        )
        .select(
            F.col("window.start").alias("window_start"), "sink", "n",
            "sum_bytes", "sum_latency", "n_convs_approx",
        )
    )


def session_reduce_stream(
    stream: DataFrame,
    *,
    gap_sec: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """reduce's session flush (expire_after_ms) as a native
    session_window aggregation: a conversation's events merge while
    gaps stay under ``gap_sec``."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", f"{gap_sec} seconds"), F.col("conv_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min("turn_idx").alias("first_turn"),
            F.max("turn_idx").alias("last_turn"),
        )
        .select(
            "conv_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_turns", "first_turn", "last_turn",
        )
    )


_STATE_SCHEMA = "total long"
_OUT_SCHEMA = "role string, batch_rows long, running_total long"


def _count_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    batch = sum(len(p) for p in pdfs)
    total = (state.get[0] if state.exists else 0) + batch
    state.update((total,))
    yield pd.DataFrame(
        {"role": [key[0]], "batch_rows": [batch], "running_total": [total]}
    )


def stateful_running_count(stream: DataFrame, key: str = "role") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState — the
    analogue of the reference's stateful Task transforms (per-key state
    living across batches, e.g. incremental_to_absolute's normalizer
    cache).  Emits (key, batch_rows, running_total) per micro-batch."""
    return stream.groupBy(key).applyInPandasWithState(
        _count_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_throttle(
    stream: DataFrame,
    threshold: int,
    window_sec: int,
    key: str,
    *,
    ts_col: str = "ts",
) -> DataFrame:
    """Stateful streaming throttle — the reference's token bucket
    (throttle/transform.rs:44-55) as per-key state living across
    micro-batches: admit the first ``threshold`` events per (key,
    event-time window); later batches see the running count, so the
    cap holds across the whole stream (unlike a per-batch window).
    Admission among in-flight events follows event order within a
    batch and arrival order across batches — the reference's
    processing-order semantics.  The single (window, used) state slot
    assumes per-key windows arrive non-decreasing (event-time-ordered
    streams); a late window restarts the count, like the reference's
    bucket refill on wall-clock progression.
    """
    out_schema = stream.schema

    def _throttle_fn(
        k: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # state: (window_epoch, used)
        win, used = state.get if state.exists else (-1, 0)
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            keep_rows = []
            for _, row in pdf.iterrows():
                w = int(row[ts_col].timestamp()) // window_sec
                if w != win:
                    win, used = w, 0
                if used < threshold:
                    used += 1
                    keep_rows.append(row)
            if keep_rows:
                yield pd.DataFrame(keep_rows)
        state.update((win, used))

    return stream.groupBy(key).applyInPandasWithState(
        _throttle_fn,
        outputStructType=out_schema,
        stateStructType="win long, used long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_delay(
    stream: DataFrame,
    delay_sec: int,
    key: str,
    *,
    ts_col: str = "ts",
    watermark: str = "0 seconds",
    max_events: int | None = None,
    when_full: str = "forward",
) -> DataFrame:
    """Streaming delay (src/transforms/delay.rs:25-80): hold each event
    until ``delay_sec`` has elapsed, re-specified in EVENT time for
    determinism — an event releases when the stream's watermark passes
    ``ts + delay_sec`` (the batch engine treats delay as identity; this
    is the streaming variant where holding events is meaningful).

    Buffered rows live in per-key state; an event-time timeout fires
    the release even when no new data arrives for the key.  The bounded
    queue mirrors the reference's overflow modes where streaming allows:
    ``when_full='forward'`` emits immediately once ``max_events`` rows
    are buffered (delay.rs Forward), ``'drop_newest'`` drops the
    arriving event (DropNewest); Block has no batch analogue —
    backpressure belongs to the engine.
    """
    import base64
    import pickle

    if when_full not in ("forward", "drop_newest"):
        raise ValueError(f"unknown when_full mode {when_full!r}")
    out_schema = stream.withWatermark(ts_col, watermark).schema

    def _delay_fn(
        k: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        buf: list = (
            [pickle.loads(base64.b64decode(s)) for s in state.get[0]]
            if state.exists
            else []
        )
        immediate: list = []
        for pdf in pdfs:
            for rec in pdf.sort_values(ts_col).to_dict("records"):
                if max_events is not None and len(buf) >= max_events:
                    if when_full == "drop_newest":
                        continue
                    immediate.append(rec)  # forward: bypass the queue
                else:
                    buf.append(rec)
        wm_ms = state.getCurrentWatermarkMs()
        due = [
            r for r in buf
            if r[ts_col].timestamp() * 1000 + delay_sec * 1000 <= wm_ms
        ]
        buf = [
            r for r in buf
            if r[ts_col].timestamp() * 1000 + delay_sec * 1000 > wm_ms
        ]
        out = immediate + due
        if buf:
            state.update((
                [base64.b64encode(pickle.dumps(r)).decode() for r in buf],
            ))
            next_release = min(
                int(r[ts_col].timestamp() * 1000) + delay_sec * 1000
                for r in buf
            )
            state.setTimeoutTimestamp(max(next_release, wm_ms + 1))
        elif state.exists:
            state.remove()
        if out:
            yield pd.DataFrame(out)

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            _delay_fn,
            outputStructType=out_schema,
            stateStructType="buf array<string>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_dedupe(
    stream: DataFrame,
    match: list[str],
    *,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming dedupe — the reference's dedupe transform's LRU cache
    re-expressed as watermarked `dropDuplicates`: state is bounded by
    the watermark horizon instead of cache_size (the deterministic
    event-time analogue; same first-wins semantics within the horizon)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates(match)


def run_to_memory(
    sdf: DataFrame,
    name: str,
    *,
    output_mode: str = "complete",
) -> Any:
    """Drive a streaming frame to completion into an in-memory table
    (smoke-test harness: processAllAvailable + stop)."""
    q = (
        sdf.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q


def write_stream_to_table(
    sdf: DataFrame,
    table,
    *,
    mode: str = "append",
) -> Any:
    """Exactly-once streaming sink into a SnapshotTable via foreachBatch.

    Vector's end-to-end acks (finalization.rs: sink delivery status →
    source offset commit) re-expressed: each micro-batch commits as one
    atomic snapshot tagged with its batch id; a replayed batch (source
    restart) is detected and skipped, so the table sees every batch
    exactly once.
    """

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        last = table.history()
        seen = {m.get("batch_id") for m in last}
        if batch_id in seen:
            return  # replayed batch after restart — already committed
        snap = table.commit(batch_df, mode=mode)
        _tag_batch(table, snap, batch_id)

    q = sdf.writeStream.outputMode("append").foreachBatch(commit_batch).start()
    q.processAllAvailable()
    q.stop()
    return q


def _tag_batch(table, snap: int, batch_id: int) -> None:
    """Tag a snapshot manifest with its micro-batch id (replay detection)."""
    import json as _json
    import os as _os

    mpath = _os.path.join(table.manifest_dir, f"{snap}.json")
    with open(mpath) as f:
        m = _json.load(f)
    m["batch_id"] = batch_id
    with open(mpath, "w") as f:
        _json.dump(m, f)


def write_stream_to_memory_table(
    sdf: DataFrame,
    mem_table,
    *,
    written_ts_col: str = "ts",
) -> Any:
    """Stream micro-batches INTO a memory enrichment table — the
    streaming leg of 'the pipeline writes the table it later joins
    against' (src/enrichment_tables/memory/table.rs:429: the table as a
    sink).  Exactly-once via the same batch-id-tagged snapshot commits
    as :func:`write_stream_to_table`; TTL/last-write-wins semantics
    come from the table itself, so stream-built state == batch-built
    state on the same rows (tested)."""

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        seen = {m.get("batch_id") for m in mem_table._table.history()}
        if batch_id in seen:
            return
        snap = mem_table.write(batch_df, written_ts_col=written_ts_col)
        _tag_batch(mem_table._table, snap, batch_id)

    q = sdf.writeStream.outputMode("append").foreachBatch(commit_batch).start()
    q.processAllAvailable()
    q.stop()
    return q


#: binaryFile's fixed schema (file streaming source)
_BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def stream_binary_files(
    spark: SparkSession,
    source_dir: str,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming binary-file tail — the micro-batch equivalent of the
    reference's file-watching sources for BINARY payload formats (each
    new file = one payload).  Feed through any binary codec flatten."""
    reader = spark.readStream.format("binaryFile").schema(
        _BINARY_FILE_SCHEMA
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(source_dir)


def stream_otlp_log_records(
    spark: SparkSession, source_dir: str, **kwargs
) -> DataFrame:
    """Streaming OTLP logs source: tail a directory of export-request
    files into typed LogRecord rows.  mapInPandas flattens work
    unchanged on streaming frames (stateless row generators), so
    stream output == batch output over the same files (tested)."""
    from vector_spark.sources.otlp import otlp_log_records

    return otlp_log_records(
        stream_binary_files(spark, source_dir, **kwargs)
    )


def stream_avro(
    spark: SparkSession, source_dir: str, schema_json: str,
    *, reader_schema: str | None = None, **kwargs
) -> DataFrame:
    """Streaming Avro container-file source (jar-free): tail a
    directory of .avro files into typed rows via the same
    decode-to-JSON + from_json seam as `read_avro` (stream == batch
    over the same files; schema must be supplied — a streaming source
    cannot peek the first file)."""
    import json as _json

    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import functions as F

    from vector_spark.sources.avro import (
        AvroSchemaError, _jsonable, _struct_ddl, parse_schema,
        read_container,
    )

    parsed = parse_schema(reader_schema or schema_json)
    ddl = _struct_ddl(reader_schema or schema_json)
    reader_parsed = parse_schema(reader_schema) if reader_schema else None
    binary = stream_binary_files(spark, source_dir, **kwargs)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                try:
                    _, recs = read_container(
                        bytes(blob), reader=reader_parsed
                    )
                except (ValueError, AvroSchemaError):
                    continue
                for r in recs:
                    rows.append(_json.dumps(
                        _jsonable(parsed["root"], parsed["names"], r),
                        separators=(",", ":"), sort_keys=True,
                    ))
            yield pd.DataFrame({"value": rows})

    decoded = binary.select("content").mapInPandas(gen, "value string")
    return decoded.select(F.from_json("value", ddl).alias("r")).select("r.*")


def stream_dnstap(
    spark: SparkSession, source_dir: str, **kwargs
) -> DataFrame:
    """Streaming dnstap source: tail a directory of Frame Streams
    files (the fstrm container the reference's dnstap source reads —
    src/sources/dnstap + src/sources/util/framestream.rs) into one
    parsed-event JSON row per data frame.  The fstrm split and the
    dnstap parse are stateless row generators, so stream output ==
    batch output over the same files (tested)."""
    from pyspark.sql import functions as F

    from vector_spark.functions.dnstap import fstrm_frames, parse_dnstap

    binary = stream_binary_files(spark, source_dir, **kwargs)
    frames = binary.select(
        F.explode(fstrm_frames(F.col("content"))).alias("frame")
    )
    return frames.select(parse_dnstap(F.col("frame")).alias("value"))
