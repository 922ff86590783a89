"""Mergeable metric value types: DDSketch, Distribution, Set.

Reference: `MetricValue::{Set, Distribution, Sketch(AgentDDSketch)}`
(/root/reference/lib/vector-core/src/event/metric/value.rs:34-83) —
the value types that let aggregated metrics be RE-aggregated across
windows/hosts without losing accuracy guarantees.

Spark design: a sketch is a COLUMN (map<int,bigint> of log-bucket →
count, plus a zero counter), built with two groupBys (map-side
combinable), merged by exploding + re-summing — so cross-window
rollups are ordinary shuffles, no UDAF, no Python.  Quantile
extraction is a pure higher-order-function fold over the sorted
entries.

DDSketch math (relative-error alpha): gamma = (1+alpha)/(1-alpha),
bucket(x) = ceil(log_gamma x) for x > 0; estimate for bucket b is
2·gamma^b / (gamma+1) — within alpha of any value in the bucket.
Negative values are out of scope (log/byte/latency metrics are
non-negative); zeros are counted separately like the reference's
AgentDDSketch zero bin.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_ALPHA = 0.01


def _gamma(alpha: float) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


#: signed-bucket key offset: |log_gamma| of the double range is ~35k at
#: alpha=0.01, so +-100k keeps positive keys > 0 and negative keys < 0
#: with integer key order == value order (negatives mirrored, like the
#: reference's AgentDDSketch negative bins, metric/value.rs:83)
KEY_OFFSET = 100_000


def bucket_index(value: Column, alpha: float = DEFAULT_ALPHA) -> Column:
    """Signed bucket key: +(ceil(log_g|x|)+OFFSET) for x>0, mirrored
    negative for x<0 — ascending key order == ascending value order.
    Null for zero/null (the zero bin, tracked separately)."""
    g = _gamma(alpha)
    v = value.cast("double")
    absb = F.ceil(F.log(F.abs(v)) / math.log(g)).cast("int")
    return F.when(v > 0, absb + KEY_OFFSET).when(v < 0, -(absb + KEY_OFFSET))


def ddsketch(
    df: DataFrame,
    group_by: list[str],
    value_col: str,
    *,
    alpha: float = DEFAULT_ALPHA,
) -> DataFrame:
    """Build one DDSketch per group: (group..., sketch map<int,bigint>,
    n_zero, total).  Two groupBys, both with map-side partial
    aggregation; the sketch column is exact-equality comparable, so
    merge-then-build == build-directly is a testable invariant."""
    b = bucket_index(F.col(value_col), alpha)
    per_bucket = (
        # NULL values are missing samples, not zeros: bucket_index maps
        # both NULL and 0 to a NULL key, so without this filter a NULL
        # would land in n_zero/total and drag quantiles toward 0
        # (reference AgentDDSketch only ingests real samples).
        df.filter(F.col(value_col).isNotNull())
        .withColumn("_b", b)
        .groupBy(*group_by, "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return (
        per_bucket.groupBy(*group_by)
        .agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_b").isNotNull(),
                            F.struct(F.col("_b").alias("key"),
                                     F.col("_c").alias("value")),
                        )
                    )
                )
            ).alias("sketch"),
            F.sum(F.when(F.col("_b").isNull(), F.col("_c")).otherwise(0))
            .alias("n_zero"),
            F.sum("_c").alias("total"),
        )
    )


def ddsketch_merge(
    df: DataFrame,
    group_by: list[str],
    *,
    sketch_col: str = "sketch",
    zero_col: str = "n_zero",
    total_col: str = "total",
) -> DataFrame:
    """Merge sketches across a coarser grouping (e.g. window → day):
    explode the bucket maps, re-sum counts per bucket, rebuild.  This
    is the Sketch-type merge the plain quantile aggregates can't do.

    Single pass over the input (one posexplode, two map-side-combining
    groupBys, no join): zero/total ride along on each parent row's
    FIRST exploded entry so they count once — a separate zt aggregation
    would re-scan (and recompute) the whole upstream."""
    once = F.col("_pos").isNull() | (F.col("_pos") == 0)
    exploded = df.select(
        *group_by,
        F.posexplode_outer(F.map_entries(F.col(sketch_col))).alias(
            "_pos", "_e"
        ),
        F.col(zero_col).alias("_z"),
        F.col(total_col).alias("_t"),
    )
    per_bucket = exploded.groupBy(
        *group_by, F.col("_e.key").alias("_b")
    ).agg(
        F.sum("_e.value").alias("_c"),
        F.sum(F.when(once, F.col("_z")).otherwise(0)).alias("_zp"),
        F.sum(F.when(once, F.col("_t")).otherwise(0)).alias("_tp"),
    )
    return per_bucket.groupBy(*group_by).agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("_b").isNotNull(),
                        F.struct(F.col("_b").alias("key"),
                                 F.col("_c").alias("value")),
                    )
                )
            )
        ).alias("sketch"),
        F.sum("_zp").alias("n_zero"),
        F.sum("_tp").alias("total"),
    )


def _fold_rank(entries: Column, start: Column, rank: Column) -> Column:
    """First entry key whose cumulative count (starting at ``start``)
    reaches ``rank`` — pure higher-order fold, no UDF."""
    return F.aggregate(
        entries,
        F.struct(
            start.cast("long").alias("cum"),
            F.lit(None).cast("int").alias("bucket"),
        ),
        lambda acc, e: F.struct(
            (acc.getField("cum") + e.getField("value")).alias("cum"),
            F.when(
                acc.getField("bucket").isNull()
                & (acc.getField("cum") + e.getField("value") >= rank),
                e.getField("key"),
            ).otherwise(acc.getField("bucket")).alias("bucket"),
        ),
    ).getField("bucket")


def ddsketch_quantile(
    sketch: Column,
    n_zero: Column,
    total: Column,
    q: float,
    *,
    alpha: float = DEFAULT_ALPHA,
) -> Column:
    """Quantile estimate from a sketch column — pure folds over the
    sorted (key, count) entries, no UDF.  rank = ceil(q·total); value
    order is negatives (mirrored keys) < zero bin < positives, which is
    exactly ascending key order with the zero bin spliced at key 0."""
    g = _gamma(alpha)
    rank = F.ceil(F.lit(q) * total.cast("double")).cast("long")
    entries = F.array_sort(F.map_entries(sketch))
    neg = F.filter(entries, lambda e: e.getField("key") < 0)
    pos = F.filter(entries, lambda e: e.getField("key") > 0)
    neg_total = F.aggregate(
        neg, F.lit(0).cast("long"), lambda acc, e: acc + e.getField("value")
    )
    found_neg = _fold_rank(neg, F.lit(0), rank)
    found_pos = _fold_rank(pos, neg_total + n_zero.cast("long"), rank)

    def _est(key: Column) -> Column:
        mag = F.pow(
            F.lit(g), (F.abs(key) - F.lit(KEY_OFFSET)).cast("double")
        ) * F.lit(2.0) / F.lit(g + 1.0)
        return F.when(key < 0, -mag).otherwise(mag)

    return F.round(
        F.when(rank <= neg_total, _est(found_neg))
        .when(rank <= neg_total + n_zero.cast("long"), F.lit(0.0))
        .otherwise(_est(found_pos)),
        6,
    )


def hll(
    df: DataFrame, group_by: list[str], value_col: str, *, lgk: int = 12
) -> DataFrame:
    """Mergeable distinct-count sketch (Datasketches HLL via Spark
    builtins) — the cardinality analogue of the DDSketch column: build
    per fine group, union up to coarser rollups without re-scanning
    raw data.  ``lgk``=12 → ~1.6KB per sketch, ~1.6% error."""
    return df.groupBy(*group_by).agg(
        F.hll_sketch_agg(value_col, lgk).alias("hll")
    )


def hll_merge(
    df: DataFrame, group_by: list[str], *, sketch_col: str = "hll"
) -> DataFrame:
    """Union sketches across a coarser grouping."""
    return df.groupBy(*group_by).agg(
        F.hll_union_agg(sketch_col).alias("hll")
    )


def hll_estimate(sketch: Column) -> Column:
    return F.hll_sketch_estimate(sketch)


def distribution(
    df: DataFrame, group_by: list[str], value_col: str
) -> DataFrame:
    """Distribution value type: (value, sample_count) pairs — exact and
    mergeable (value.rs:40: samples with rates)."""
    return (
        df.groupBy(*group_by, value_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy(*group_by)
        .agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(value_col).alias("key"), F.col("n").alias("value")
                        )
                    )
                )
            ).alias("dist")
        )
    )


def set_values(df: DataFrame, group_by: list[str], value_col: str) -> DataFrame:
    """Set value type: distinct values per group (value.rs:34)."""
    return df.groupBy(*group_by).agg(
        F.array_sort(F.collect_set(value_col)).alias("values")
    )
