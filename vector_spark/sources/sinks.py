"""Sinks: table writes with batching/partitioning semantics.

Reference sink machinery (SURVEY §2.5): batching by
max_bytes/max_events/timeout (src/sinks/util/batch.rs:104-117), the
KeyPartitioner template that routes events to output partitions
(src/sinks/util/partitioner.rs:55-75), adaptive request concurrency,
end-to-end acks.  Spark re-expression:

- batching          → parquet row groups + ``maxRecordsPerFile``
- KeyPartitioner    → ``partitionBy(template_columns)``
- acked delivery    → atomic table commit (_SUCCESS / Iceberg snapshot)
- adaptive conc.    → task parallelism (scheduler-owned)
- 60 vendor APIs    → out of scope for a batch engine; the table/file
  sinks (S3/HDFS/file/console/blackhole) are the shapes that matter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def key_partition_column(template_cols: dict[str, Column]) -> list[str]:
    """KeyPartitioner analogue: caller supplies rendered template
    columns (e.g. dt=date_format(ts, 'yyyy-MM-dd')); returns names to
    pass to partitionBy."""
    return list(template_cols)


def write_sink(
    df: DataFrame,
    path: str,
    *,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_template: dict[str, Column] | None = None,
    max_records_per_file: int | None = None,
    compression: str | None = None,
) -> None:
    """One sink write: optional template partitioning + batch sizing +
    compression codec (the sink-side `compression` option — gzip/zstd/
    snappy for parquet, gzip for json/csv)."""
    if partition_template:
        for name, col in partition_template.items():
            df = df.withColumn(name, col)
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if compression:
        writer = writer.option("compression", compression)
    if partition_template:
        writer = writer.partitionBy(*partition_template)
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "csv":
        writer.option("header", True).csv(path)
    elif fmt == "iceberg":
        try:
            writer.format("iceberg").save(path)
        except Exception as exc:
            raise RuntimeError(
                "iceberg sink requires the iceberg-spark runtime jar "
                f"(not bundled in this environment): {exc}"
            ) from exc
    else:
        raise ValueError(f"unknown sink format {fmt!r}")


def fan_out_write(
    sinks: dict[str, DataFrame],
    base_dir: str,
    *,
    fmt: str = "parquet",
    partition_template: dict[str, Column] | None = None,
) -> dict[str, int]:
    """Per-sink table writes for a route() result — the non-exclusive
    fan-out (clone-per-match multiplicity lands here, one filtered
    pass per sink over the shared cached upstream).  Returns per-sink
    row counts (read back from the committed tables, so the counts are
    what a downstream consumer will actually see)."""
    from pyspark.sql import SparkSession

    counts: dict[str, int] = {}
    for name, df in sinks.items():
        path = f"{base_dir}/{name}"
        write_sink(
            df, path, fmt=fmt, partition_template=partition_template
        )
        spark = SparkSession.getActiveSession()
        counts[name] = spark.read.format(fmt).load(path).count()
    return counts


def render_encoded(
    df: DataFrame, codec: str, options: dict | None = None
) -> DataFrame:
    """Sink-side line encoding: render each event as ONE string row
    named ``value`` — the Spark shape of the reference's per-sink
    encoder stack (lib/codecs/src/encoding/format/: text, raw_message,
    json, logfmt, csv, syslog, gelf, cef).  All JVM column expressions
    (no UDF); the ``arrow`` / ``parquet`` encoder formats map to
    Spark's native writers in :func:`write_sink` instead.

    ``options`` carries the per-codec field mappings the reference
    takes as encoder config: a field NAME per role (the batch
    rendering of its ConfigTargetPath options)."""
    from pyspark.sql import functions as F

    opts = options or {}

    def _field(role: str, *defaults: str) -> str | None:
        name = opts.get(role)
        if name:
            return name
        return next((d for d in defaults if d in df.columns), None)

    def _col(role: str, *defaults: str):
        name = _field(role, *defaults)
        return F.col(name) if name else None

    if codec in ("text", "raw_message"):
        # text.rs / raw_message.rs: the message key, coerced to bytes;
        # a missing message writes an empty payload
        msg = _col("message_field", "message", "text", "value")
        if msg is None:
            raise ValueError(f"{codec} encoding needs a message field")
        line = F.coalesce(msg.cast("string"), F.lit(""))
    elif codec == "json":
        line = F.to_json(F.struct(*df.columns))
    elif codec == "logfmt":
        from vector_spark.functions.vrl import encode_logfmt

        pairs = []
        for c in df.columns:
            pairs += [F.lit(c), F.col(c).cast("string")]
        line = encode_logfmt(F.create_map(*pairs))
    elif codec == "csv":
        from vector_spark.functions.vrl import encode_csv

        fields = opts.get("fields") or df.columns
        line = encode_csv(F.struct(*df.columns), fields)
    elif codec == "syslog":
        from vector_spark.functions.vrl import encode_syslog

        msg = _col("message_field", "message", "text", "value")
        if msg is None:
            raise ValueError("syslog encoding needs a message field")
        line = encode_syslog(
            msg,
            rfc=opts.get("rfc", "rfc5424"),
            facility=_col("facility"),
            severity=_col("severity"),
            app_name=_col("app_name", "appname", "service"),
            proc_id=_col("proc_id", "procid"),
            msg_id=_col("msg_id", "msgid"),
            hostname=_col("host_field", "hostname", "host"),
            timestamp=_col("timestamp_field", "timestamp", "ts"),
            structured_data=_col("structured_data_field"),
        )
    elif codec == "gelf":
        from vector_spark.functions.vrl import encode_gelf

        host_f = _field("host_field", "host", "hostname")
        msg_f = _field("message_field", "short_message", "message", "text")
        if host_f is None or msg_f is None:
            raise ValueError("gelf encoding needs host and message fields")
        ts_f = _field("timestamp_field", "timestamp", "ts")
        lvl_f = _field("level_field", "level")
        used = {host_f, msg_f, ts_f, lvl_f}
        line = encode_gelf(
            F.col(host_f),
            F.col(msg_f),
            timestamp=F.col(ts_f) if ts_f else None,
            level=F.col(lvl_f) if lvl_f else None,
            additional={c: F.col(c) for c in df.columns if c not in used},
        )
    elif codec == "cef":
        from vector_spark.functions.vrl import encode_cef

        name_f = _field("name_field", "name", "message", "text")
        sev_f = _field("severity_field", "severity", "level")
        if name_f is None or sev_f is None:
            raise ValueError("cef encoding needs name and severity fields")
        line = encode_cef(
            F.col(name_f),
            F.col(sev_f),
            extensions={
                c: F.col(c) for c in df.columns if c not in (name_f, sev_f)
            },
        )
    else:
        raise ValueError(f"unknown sink encoding codec {codec!r}")
    return df.select(line.alias("value"))


def blackhole(df: DataFrame) -> int:
    """The blackhole sink (consume + count, write nothing)."""
    return df.count()


def console(df: DataFrame, n: int = 20) -> None:
    df.show(n, truncate=80)
