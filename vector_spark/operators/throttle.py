"""throttle — cap events per key per time window.

Reference: token bucket allowing ≤ ``threshold`` events per
``window_secs`` per rendered ``key_field``, excess silently dropped,
``exclude`` bypass (/root/reference/src/transforms/throttle/config.rs:40-55,
transform.rs:44-55,103-139).

Batch re-specification: the continuously-refilling bucket is
processing-time; the deterministic analogue admits the FIRST
``threshold`` events per (key, tumbling window) in stable event order —
row_number over one shuffle.  At 100 TB this is the only reproducible
definition and it matches the bucket's steady-state admission rate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from vector_spark.conditions import to_condition
from vector_spark.operators.aggregate import window_start


def throttle(
    df: DataFrame,
    threshold: int,
    window_sec: int,
    key_fields: list[str] | None = None,
    *,
    ts_col: str = "ts",
    order_by: list[str] | None = None,
    exclude: Column | str | bool | None = None,
) -> DataFrame:
    keys = [F.col(c) for c in (key_fields or [])]
    win = window_start(F.col(ts_col), window_sec)
    order = order_by or [c for c in (ts_col, "conv_id", "turn_idx") if c in df.columns]
    w = W.partitionBy(*keys, win).orderBy(*order)
    if exclude is None:
        keep = F.row_number().over(w) <= threshold
    else:
        # excluded events bypass the limiter and do NOT consume
        # capacity (transform.rs:103-110): rank only non-excluded rows.
        # A null condition result means "not excluded" (Condition::check
        # is boolean) — coalesce so SQL ternary logic can't leak into
        # either the bypass or the capacity count.
        exc = F.coalesce(to_condition(exclude).cast("boolean"), F.lit(False))
        admitted = F.sum((~exc).cast("int")).over(
            w.rowsBetween(W.unboundedPreceding, 0)
        )
        keep = exc | (admitted <= threshold)
    return (
        df.withColumn("_th_keep", keep)
        .filter(F.col("_th_keep"))
        .drop("_th_keep")
    )
