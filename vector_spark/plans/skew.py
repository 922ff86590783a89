"""Skew handling — salted repartition for hot keys.

The reference sidesteps data skew by hash-sharding chunks across tokio
tasks with work stealing (/root/reference/lib/vector-core/src/transform/
mod.rs task transforms; builder.rs:1350-1420 concurrent runner).  A
shuffle-based engine must handle it explicitly: the synthetic workload
puts ~30% of turns in 1% of conversations, so any shuffle keyed by
conv_id alone leaves a few straggler partitions.

Two mechanisms, used together:
- AQE skew-join/partition splitting (enabled in session.py) for joins
  and window shuffles at runtime;
- explicit salting here for the parse→route boundary and for
  aggregations that can be decomposed into partial + merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_salt(
    df: DataFrame,
    salt_buckets: int,
    *,
    salt_col: str = "_salt",
    source: Column | None = None,
) -> DataFrame:
    """Deterministic salt column in [0, salt_buckets).

    Default source is turn_idx (uniform within a conversation) so a hot
    conv_id spreads evenly over ``salt_buckets`` shuffle partitions.
    """
    src = source if source is not None else F.col("turn_idx")
    return df.withColumn(salt_col, F.pmod(F.xxhash64(src), F.lit(salt_buckets)))


def salted_repartition(
    df: DataFrame,
    keys: list[str],
    num_partitions: int,
    salt_buckets: int = 16,
    *,
    salt_col: str = "_salt",
) -> DataFrame:
    """repartition(n, keys..., salt) — co-locates rows of a key into at
    most ``salt_buckets`` partitions instead of one, defusing hot keys
    while keeping locality good enough for per-conversation work that
    is later merged (two-phase aggregation)."""
    salted = with_salt(df, salt_buckets, salt_col=salt_col)
    return salted.repartition(num_partitions, *keys, salt_col)


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    salt_buckets: int = 16,
    *,
    salt_col: str = "_salt",
) -> DataFrame:
    """Salted two-phase aggregation for reassociable aggregates:
    groupBy(keys + salt) partials, then groupBy(keys) merge.  The first
    shuffle spreads a hot key over ``salt_buckets`` reducers; the second
    shuffle moves only ``salt_buckets`` rows per key."""
    salted = with_salt(df, salt_buckets, salt_col=salt_col)
    partial = salted.groupBy(*keys, salt_col).agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


def partition_histogram(df: DataFrame) -> list[tuple[int, int]]:
    """(partition_id, row_count) pairs — the skew diagnostic used by
    tests and the checkpoint manifest."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .orderBy("pid")
        .collect()
    )
    return [(r["pid"], r["count"]) for r in rows]
