"""Metric-family operators: log_to_metric, metric_to_log,
incremental_to_absolute, tag_cardinality_limit, static enrichment,
delay.

The metric data model (SURVEY §1.3): a metric row is
``(name string, namespace string, tags map<string,string>,
kind string['incremental'|'absolute'], value double, ts timestamp)`` —
the Spark relational rendering of MetricSeries/MetricData
(/root/reference/lib/vector-core/src/event/metric/mod.rs:56-100).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

METRIC_COLS = ["name", "namespace", "tags", "kind", "value", "ts"]


def log_to_metric(
    df: DataFrame,
    rules: list[dict] | None = None,
    *,
    ts_col: str = "ts",
    all_metrics: bool = False,
) -> DataFrame:
    """Derive metric rows from log fields
    (/root/reference/src/transforms/log_to_metric.rs:45-77).

    Each rule: ``{type: 'counter'|'gauge'|'set'|'histogram',
    name: str, namespace: str, field: str|None, tags: {k: column_name}}``.
    - counter without field → value 1 per event; with field →
      increment_by_value.
    - gauge/histogram → the field's numeric value (histogram buckets are
      an aggregation concern downstream).
    Rows where the rule's field is null are skipped (the reference's
    per-rule template render failure).  Output is the UNION of the
    per-rule projections — one pass per rule over a shared scan.

    ``all_metrics=True`` (log_to_metric.rs:82-158): the log IS a
    serialized metric — project its (name, namespace, tags, kind,
    value, ts) columns straight through, defaulting the optional ones.
    """
    if all_metrics:
        cols = {
            "name": F.col("name"),
            "namespace": (
                F.col("namespace") if "namespace" in df.columns
                else F.lit("ns")
            ),
            "tags": (
                F.col("tags") if "tags" in df.columns
                else F.create_map().cast("map<string,string>")
            ),
            "kind": (
                F.col("kind") if "kind" in df.columns
                else F.lit("absolute")
            ),
            "value": F.col("value").cast("double"),
            "ts": F.col(ts_col),
        }
        return df.select(*[c.alias(n) for n, c in cols.items()])
    # ONE pass: an array of per-rule metric structs (null when the
    # rule's field is null) + explode — a union of per-rule branches
    # would re-evaluate the upstream frame once per rule (Catalyst does
    # not share subtrees across union branches)
    metric_structs = []
    for r in rules:
        field = r.get("field")
        value = (
            F.lit(1.0) if field is None else F.col(field).cast("double")
        )
        tags = r.get("tags", {})
        tag_col = F.map_from_arrays(
            F.array(*[F.lit(k) for k in tags]),
            F.array(*[F.col(v).cast("string") for v in tags.values()]),
        ) if tags else F.create_map().cast("map<string,string>")
        s = F.struct(
            F.lit(r["name"]).alias("name"),
            F.lit(r.get("namespace", "ns")).alias("namespace"),
            tag_col.alias("tags"),
            F.lit(
                "absolute" if r.get("type") == "gauge" else "incremental"
            ).alias("kind"),
            value.alias("value"),
            F.col(ts_col).alias("ts"),
        )
        if field is not None:
            s = F.when(value.isNotNull(), s)
        metric_structs.append(s)
    return df.select(
        F.explode(F.array_compact(F.array(*metric_structs))).alias("_m")
    ).select("_m.*")


def metric_to_log(df: DataFrame) -> DataFrame:
    """Serialize metric rows into structured logs
    (/root/reference/src/transforms/metric_to_log.rs:33-90):
    one JSON message column + the flattened fields."""
    return df.select(
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("message"),
        *[F.col(c) for c in df.columns],
    )


def trace_to_log(df: DataFrame, kind_col: str = "kind") -> DataFrame:
    """Re-tag trace events as logs
    (/root/reference/src/transforms/trace_to_log.rs) — a relabel."""
    if kind_col in df.columns:
        return df.withColumn(kind_col, F.lit("log"))
    return df


def incremental_to_absolute(
    df: DataFrame,
    series_keys: list[str] = ("name", "namespace"),
    *,
    value_col: str = "value",
    ts_col: str = "ts",
    kind_col: str = "kind",
) -> DataFrame:
    """Running cumulative sum per series
    (/root/reference/src/transforms/incremental_to_absolute.rs:21-100):
    incremental rows become absolute running totals; absolute rows pass
    through unchanged."""
    # RANGE frame: simultaneous events share the same cumulative value,
    # keeping the result deterministic under timestamp ties.
    w = (
        W.partitionBy(*series_keys)
        .orderBy(ts_col)
        .rangeBetween(W.unboundedPreceding, 0)
    )
    running = F.sum(
        F.when(F.col(kind_col) == "incremental", F.col(value_col))
    ).over(w)
    return df.withColumn(
        value_col,
        F.when(F.col(kind_col) == "incremental", running).otherwise(
            F.col(value_col)
        ),
    ).withColumn(kind_col, F.lit("absolute"))


def tag_cardinality_limit(
    df: DataFrame,
    tag_cols: list[str],
    value_limit: int = 500,
    *,
    action: str = "drop_tag",
    ts_col: str = "ts",
    order_by: list[str] | None = None,
    mode: str = "exact",
    cache_bits: int = 4096,
    bloom_k: int = 4,
) -> DataFrame:
    """Cap distinct values per tag column
    (/root/reference/src/transforms/tag_cardinality_limit/config.rs:89-170).

    Deterministic re-spec of the first-seen HashSet: a tag value is
    "accepted" if it is among the first ``value_limit`` distinct values
    by first-seen time (min ts, value as tie-break).  ``drop_tag``
    nulls the offending tag; ``drop_event`` drops the row — events
    WITHOUT the tag pass through untouched in both modes
    (tag_cardinality_limit/transform.rs: events lacking the tag are
    never dropped).  Cost: one small agg per tag (distinct values)
    broadcast back — no extra shuffle of the fact table.

    Tracking ``mode`` mirrors config.rs:125-148 / tag_value_set.rs:

    - ``exact``: the first-seen value set itself.
    - ``exact_fingerprint``: track 60-bit portable-hash fingerprints
      instead of strings — the memory trade; a fingerprint collision
      admits the colliding value (reference: "a very small chance of
      collisions at very high cardinalities").
    - ``probabilistic``: a ``cache_bits``-wide bloom filter
      (``bloom_k`` hashes) over the first ``value_limit`` inserted
      values; a post-limit value is STILL accepted when all its bit
      positions collide with inserted bits — the reference's "may
      occasionally allow metric events to pass through", tunable via
      cache size.  The filter is the portable md5-bit construction
      (operators/probabilistic.py), so the oracle replays every
      false positive.

    The acceptance set is a parallel top-K (``orderBy().limit()`` →
    TakeOrderedAndProject: per-partition heaps, K·P rows merged at the
    driver), NOT a global-window row_number — the distinct-values frame
    is exactly what explodes in the cardinality-blowup scenario this
    operator guards against, so it must never hit a single reducer.
    In probabilistic mode the post-limit bloom test is a distributed
    join on bit position over the distinct-values frame — never a
    driver-side set.
    """
    from vector_spark.datapipe.dedup import portable_hash60
    from vector_spark.operators.probabilistic import (
        bloom_build,
        bloom_positions,
    )

    if mode not in ("exact", "exact_fingerprint", "probabilistic"):
        raise ValueError(f"unknown tag_cardinality mode {mode!r}")
    out = df
    for tag in tag_cols:
        vals = (
            df.filter(F.col(tag).isNotNull())
            .groupBy(tag)
            .agg(F.min(ts_col).alias("_first_ts"))
        )
        if mode == "exact_fingerprint":
            # first-seen per FINGERPRINT: every value mapping to an
            # accepted fingerprint is accepted (collision = extra value)
            fp = portable_hash60(F.col(tag).cast("string"))
            ok_fps = (
                vals.withColumn("_fp", fp)
                .groupBy("_fp")
                .agg(F.min("_first_ts").alias("_first_ts"))
                .orderBy(F.col("_first_ts"), F.col("_fp"))
                .limit(value_limit)
                .select("_fp")
            )
            first_seen = (
                vals.withColumn("_fp", fp)
                .join(F.broadcast(ok_fps), "_fp")
                .select(F.col(tag).alias("_ok_val"))
            )
        else:
            first_seen = (
                vals.orderBy(F.col("_first_ts"), F.col(tag))
                .limit(value_limit)
                .select(F.col(tag).alias("_ok_val"))
            )
        if mode == "probabilistic":
            bits = bloom_build(
                first_seen, "_ok_val", m_bits=cache_bits, k=bloom_k
            )
            fp_hits = (
                vals.join(
                    F.broadcast(
                        first_seen.withColumnRenamed("_ok_val", tag)
                    ),
                    tag,
                    "left_anti",
                )
                .withColumn(
                    "_pos",
                    F.explode(
                        bloom_positions(
                            F.col(tag), m_bits=cache_bits, k=bloom_k
                        )
                    ),
                )
                .join(F.broadcast(bits.withColumnRenamed("pos", "_pos")),
                      "_pos")
                .groupBy(tag)
                .agg(F.count(F.lit(1)).alias("_n_hit"))
                .filter(F.col("_n_hit") == bloom_k)
                .select(F.col(tag).alias("_ok_val"))
            )
            first_seen = first_seen.unionByName(fp_hits)
        ok = F.broadcast(first_seen)
        joined = out.join(ok, out[tag] == ok["_ok_val"], "left")
        if action == "drop_tag":
            out = joined.withColumn(
                tag,
                F.when(F.col("_ok_val").isNotNull(), F.col(tag)),
            ).drop("_ok_val")
        elif action == "drop_event":
            out = joined.filter(
                F.col(tag).isNull() | F.col("_ok_val").isNotNull()
            ).drop("_ok_val")
        else:
            raise ValueError(f"unknown action {action!r}")
    return out


def static_enrich(df: DataFrame, fields: dict[str, object]) -> DataFrame:
    """Constant metadata columns resolved at the driver — the
    aws_ec2_metadata analogue
    (/root/reference/src/transforms/aws_ec2_metadata.rs:98-158)."""
    for k, v in fields.items():
        df = df.withColumn(k, F.lit(v))
    return df


def delay(df: DataFrame) -> DataFrame:
    """delay (/root/reference/src/transforms/delay.rs:25-80) is a
    wall-clock ordering construct; in a batch DAG it is the identity."""
    return df
