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


def blackhole(df: DataFrame) -> int:
    """The blackhole sink (consume + count, write nothing)."""
    return df.count()


def console(df: DataFrame, n: int = 20) -> None:
    df.show(n, truncate=80)
