"""reduce — collapse many events into one per group (transcript merge).

Reference: events grouped by ``group_by`` fields; per-field merge
strategies ``discard, retain, sum, max, min, array, concat,
concat_newline, concat_raw, shortest_array, longest_array, flat_unique``
(/root/reference/src/transforms/reduce/config.rs:32-106,
merge_strategy.rs); defaults: first string, first timestamp plus a
``<field>_end`` last-timestamp, numbers summed.  Flush is a
processing-time session gap (`expire_after_ms`).

Batch re-specification: ordering inside a group follows (conv_id,
turn_idx) — Vector preserves arrival order per stream, we impose the
explicit Window ordering so concatenations are bit-stable across any
partitioning (the per-turn-equality gate).  Strategies that need order
sort ONCE via array_sort(collect_list(struct(ord, value))) — a single
shuffle on the group key, no per-group Python.

Session flush (`expire_after_ms`) maps to :func:`sessionize` — gap-based
session ids computed with lag + running sum, then used as part of the
group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def _ordered_list(value: Column, ord_col: Column) -> Column:
    """collect_list ordered by ord_col: array_sort on (ord, value)
    structs sorts by ord first; then project the value back out."""
    pairs = F.array_sort(F.collect_list(F.struct(ord_col.alias("o"), value.alias("v"))))
    return F.transform(pairs, lambda s: s.getField("v"))


def strategy_expr(
    strategy: str, col: str, *, ord_col: str, sep: str = " "
) -> Column:
    """One merge-strategy aggregation expression (merge_strategy.rs)."""
    v, o = F.col(col), F.col(ord_col)
    ordered = lambda: _ordered_list(v, o)  # noqa: E731
    if strategy == "discard":  # keep first (by order)
        return F.min_by(v, o)
    if strategy == "retain":  # keep last
        return F.max_by(v, o)
    if strategy == "sum":
        return F.sum(v)
    if strategy == "max":
        return F.max(v)
    if strategy == "min":
        return F.min(v)
    if strategy == "array":
        return ordered()
    if strategy == "concat":
        return F.array_join(ordered(), sep)
    if strategy == "concat_newline":
        return F.array_join(ordered(), "\n")
    if strategy == "concat_raw":
        return F.array_join(ordered(), "")
    if strategy == "shortest_array":
        return F.min_by(v, F.size(v))
    if strategy == "longest_array":
        return F.max_by(v, F.size(v))
    if strategy == "flat_unique":
        return F.array_distinct(F.flatten(F.collect_list(v)))
    if strategy == "count":
        return F.count(v)
    raise ValueError(f"unknown merge strategy {strategy!r}")


def reduce_events(
    df: DataFrame,
    group_by: list[str],
    strategies: dict[str, tuple],
    *,
    ord_col: str = "turn_idx",
    ts_col: str = "ts",
    timestamps: bool = True,
) -> DataFrame:
    """``strategies``: out_name -> (strategy, column[, sep]).

    With ``timestamps`` (the reference default), adds first(ts) as
    ``ts`` and last(ts) as ``ts_end``.
    """
    aggs = [
        strategy_expr(spec[0], spec[1], ord_col=ord_col,
                      sep=spec[2] if len(spec) > 2 else " ").alias(out)
        for out, spec in strategies.items()
    ]
    if timestamps:
        aggs.append(F.min(F.col(ts_col)).alias(ts_col))
        aggs.append(F.max(F.col(ts_col)).alias(f"{ts_col}_end"))
    return df.groupBy(*group_by).agg(*aggs)


def reduce_segments(
    df: DataFrame,
    group_by: list[str],
    *,
    ord_col: str = "turn_idx",
    starts_when=None,
    ends_when=None,
    max_events: int | None = None,
    segment_col: str = "_segment",
) -> DataFrame:
    """Condition/count flush triggers for reduce
    (reduce/transform.rs transform_one: `starts_when` flushes BEFORE a
    matching event, `ends_when` flushes AFTER including it,
    `max_events` caps a group's size; starts_when and ends_when are
    mutually exclusive like the reference, transform.rs:180-182).

    Adds a per-group ``segment_col``; callers group by
    (group_by + segment).  Single-trigger cases are pure window
    expressions; combining `max_events` WITH a condition is inherently
    sequential (the count resets at condition boundaries), so that case
    runs an ordered per-group scan via applyInPandas — same
    parallelism as the reference (groups concurrent, events within a
    group ordered).
    """
    from vector_spark.conditions import to_condition

    if starts_when is not None and ends_when is not None:
        raise ValueError(
            "only one of `ends_when` and `starts_when` can be provided"
        )
    w = W.partitionBy(*group_by).orderBy(ord_col)
    cum = w.rowsBetween(W.unboundedPreceding, 0)

    cond = starts_when if starts_when is not None else ends_when
    if cond is not None and max_events is None:
        # null condition results never trigger (SQL null != true)
        c = F.coalesce(to_condition(cond).cast("boolean"), F.lit(False))
        if starts_when is not None:
            is_start = c | (F.row_number().over(w) == 1)
        else:
            prev = F.lag(c).over(w)
            is_start = prev.isNull() | prev
        return df.withColumn(
            segment_col, F.sum(is_start.cast("int")).over(cum) - 1
        )
    if cond is None and max_events is not None:
        return df.withColumn(
            segment_col,
            ((F.row_number().over(w) - 1) / max_events).cast("long"),
        )
    if cond is None and max_events is None:
        return df.withColumn(segment_col, F.lit(0).cast("long"))

    # combined: sequential scan per group (bounded group sizes)
    import pandas as pd

    c = to_condition(cond)
    marked = df.withColumn("_hit", c.cast("boolean"))
    fields = {f.name: f.dataType.simpleString() for f in marked.schema.fields}
    out_schema = ", ".join(
        [f"`{n}` {t}" for n, t in fields.items()] + [f"`{segment_col}` bigint"]
    )
    is_starts = starts_when is not None
    max_n = max_events

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ord_col).reset_index(drop=True)
        seg, count, cur = [], 0, -1
        for hit in pdf["_hit"].fillna(False):
            if is_starts:
                if hit or count >= max_n or cur < 0:
                    cur += 1
                    count = 0
                seg.append(cur)
                count += 1
            else:
                if count >= max_n or cur < 0:
                    cur += 1
                    count = 0
                seg.append(cur)
                count += 1
                if hit:  # ends_when: included, then flush
                    cur += 1
                    count = 0
        pdf[segment_col] = seg
        return pdf

    return (
        marked.groupBy(*group_by)
        .applyInPandas(scan, schema=out_schema)
        .drop("_hit")
    )


def sessionize(
    df: DataFrame,
    group_by: list[str],
    *,
    ts_col: str = "ts",
    gap_sec: int = 30,
    session_col: str = "session_id",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Gap-based session ids — the deterministic event-time analogue of
    reduce's ``expire_after_ms`` staleness flush
    (/root/reference/src/transforms/reduce/transform.rs:225-253).

    A new session starts when the gap to the previous event in the
    group exceeds ``gap_sec``; the session id is a running count of
    session starts (lag + cumulative sum — two window passes over one
    shuffle of the group key).
    """
    w = W.partitionBy(*group_by).orderBy(ts_col, *(tiebreak_cols or []))
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(
        F.lag(ts_col).over(w)
    )
    is_start = F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_start).over(w.rowsBetween(W.unboundedPreceding, 0)) - 1,
    )
