"""Sources: one scan operator + per-source decoding codecs.

The reference ships 45 source modules (SURVEY §2.4); on Spark they
collapse into `spark.read.format(...)` plus a DECODER applied to the
payload column — mirroring the codec layer
(/root/reference/lib/codecs/src/decoding/format/: bytes, json, syslog,
gelf, logfmt/influx, csv, protobuf...).  Tailing-file checkpoints
(lib/file-source-common/src/checkpointer.rs:44-60) correspond to
Structured Streaming source offsets (vector_spark.streaming) and the
batch checkpoint manifest (plans.driver).

Kafka/Iceberg need their connector jars on the classpath; absent in
this container, the reader raises a clear error at call time (the plan
shape is identical once the jar is present).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from vector_spark.functions import vrl
from vector_spark.functions.parse import parse_key_value


def read_source(
    spark: SparkSession,
    fmt: str,
    path_or_options: str | dict,
    schema: str | None = None,
) -> DataFrame:
    """The single scan operator: parquet/csv/json/text/orc natively;
    kafka/iceberg if their connectors are on the classpath."""
    if fmt in ("parquet", "orc", "text"):
        reader = spark.read
        if schema:
            reader = reader.schema(schema)
        return getattr(reader, fmt)(path_or_options)
    if fmt == "csv":
        return spark.read.csv(path_or_options, header=True, schema=schema)
    if fmt == "json":
        reader = spark.read
        if schema:
            reader = reader.schema(schema)
        return reader.json(path_or_options)
    if fmt in ("kafka", "iceberg"):
        try:
            opts = path_or_options if isinstance(path_or_options, dict) else {}
            return spark.read.format(fmt).options(**opts).load()
        except Exception as exc:  # connector jar not on classpath here
            raise RuntimeError(
                f"{fmt} source requires its connector jar on the Spark "
                f"classpath (not bundled in this environment): {exc}"
            ) from exc
    raise ValueError(f"unknown source format {fmt!r}")


#: decoding codecs for text payloads (value column -> struct/map column)
def _decode_json(col: Column, schema: str) -> Column:
    return F.from_json(col, schema)


def _decode_syslog(col: Column, schema: str) -> Column:
    return vrl.parse_syslog(col)


def _decode_logfmt(col: Column, schema: str) -> Column:
    return parse_key_value(col)


def _decode_csv(col: Column, schema: str) -> Column:
    return F.from_csv(col, schema, {"sep": ","})


def _decode_gelf(col: Column, schema: str) -> Column:
    # GELF is JSON with well-known fields
    return F.from_json(
        col,
        schema
        or "version string, host string, short_message string, "
        "full_message string, timestamp double, level int",
    )


_DECODERS = {
    "bytes": lambda c, s: c,
    "json": _decode_json,
    "syslog": _decode_syslog,
    "logfmt": _decode_logfmt,
    "csv": _decode_csv,
    "gelf": _decode_gelf,
}


def read_text_decoded(
    spark: SparkSession,
    path: str,
    codec: str,
    schema: str | None = None,
    *,
    value_col: str = "value",
    out_col: str = "decoded",
) -> DataFrame:
    """newline-framed text source + codec decode
    (decoding/framing/newline + format codecs)."""
    if codec not in _DECODERS:
        raise ValueError(f"unknown codec {codec!r}; have {sorted(_DECODERS)}")
    df = spark.read.text(path)
    return df.withColumn(out_col, _DECODERS[codec](F.col(value_col), schema))


def line_agg(
    df: DataFrame,
    start_pattern: str,
    *,
    group_by: list[str] = (),
    order_by: str = "line_no",
    line_col: str = "value",
    mode: str = "continue_through",
    condition_pattern: str | None = None,
) -> DataFrame:
    """Multiline assembly — the reference's line_agg
    (/root/reference/src/line_agg.rs:24-76, modes ContinueThrough |
    ContinuePast | HaltBefore | HaltWith).

    Batch re-expression: a record starts at a line matching
    ``start_pattern`` (or, for halt_before, at a line NOT matching
    ``condition_pattern``); record id = running count of starts within
    the ordered group; one groupBy concatenates each record in line
    order.  One shuffle on (group, record).
    """
    cond = condition_pattern or start_pattern
    if mode == "continue_through":
        # every start-line begins a record; continuation lines don't match
        is_start = F.col(line_col).rlike(start_pattern)
    elif mode == "continue_past":
        # a line matching cond means the NEXT line continues the record:
        # a line starts a record when the PREVIOUS line did not match
        prev = F.lag(F.col(line_col)).over(
            W.partitionBy(*group_by).orderBy(order_by)
        )
        is_start = prev.isNull() | ~prev.rlike(cond)
    elif mode == "halt_before":
        # record continues while lines match cond; a non-matching line
        # starts the next record
        prev = F.lag(F.col(line_col)).over(
            W.partitionBy(*group_by).orderBy(order_by)
        )
        is_start = prev.isNull() | ~prev.rlike(cond)
    elif mode == "halt_with":
        # a line matching cond ENDS the record (inclusive)
        prev = F.lag(F.col(line_col)).over(
            W.partitionBy(*group_by).orderBy(order_by)
        )
        is_start = prev.isNull() | prev.rlike(cond)
    else:
        raise ValueError(f"unknown line_agg mode {mode!r}")

    w = W.partitionBy(*group_by).orderBy(order_by)
    rec = F.sum(is_start.cast("int")).over(
        w.rowsBetween(W.unboundedPreceding, 0)
    )
    with_rec = df.withColumn("_rec", rec)
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col(order_by).alias("o"), F.col(line_col).alias("v")))
    )
    return (
        with_rec.groupBy(*group_by, "_rec")
        .agg(
            F.array_join(
                F.transform(ordered, lambda s: s.getField("v")), "\n"
            ).alias("message"),
            F.min(order_by).alias(order_by),
        )
        .drop("_rec")
    )
