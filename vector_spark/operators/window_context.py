"""window — context lines around matching events.

Reference: ring buffer of the last ``num_events_before`` events
(default 100); when ``flush_when`` matches, emit the buffer, the event,
and the next ``num_events_after`` events; ``forward_when`` bypasses
(/root/reference/src/transforms/window/transform.rs:49-94).

Batch re-specification: per ordered group (conv_id, turn_idx), a row is
kept iff ANY row within ``[-before, +after]`` of it matches the flush
condition — max(flag) over a rows-between frame, one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from vector_spark.conditions import to_condition


def context_window(
    df: DataFrame,
    flush_when: Column | str,
    *,
    group_by: list[str] = ("conv_id",),
    order_by: list[str] = ("turn_idx",),
    before: int = 100,
    after: int = 0,
    forward_when: Column | str | None = None,
    flag_col: str | None = None,
) -> DataFrame:
    """Keep rows within ``before``/``after`` of a flush-condition hit.

    ``flag_col`` (optional) exposes whether the row itself matched
    (vs. being context).
    """
    flag = to_condition(flush_when).cast("int")
    w = (
        W.partitionBy(*group_by)
        .orderBy(*order_by)
        .rowsBetween(-after, before)  # a hit up to `before` rows ahead keeps me
    )
    near = F.max(flag).over(w) == 1
    keep = near
    if forward_when is not None:
        keep = keep | to_condition(forward_when)
    out = df.withColumn("_cw_keep", keep)
    if flag_col:
        out = out.withColumn(flag_col, flag == 1)
    return out.filter(F.col("_cw_keep")).drop("_cw_keep")
