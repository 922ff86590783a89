"""aggregate — windowed metric aggregation.

Reference: metrics aggregated per ``MetricSeries`` key and flushed every
``interval_ms`` of processing time, with modes Auto/Sum/Latest/Count/
Diff/Max/Min/Mean/Stdev (/root/reference/src/transforms/aggregate.rs:29-75,
:298-376 flush incl. mean/stdev, :379-416 interval loop).

Batch re-specification: processing-time flush is nondeterministic, so
windows are DETERMINISTIC event-time tumbling windows over ``ts`` —
same aggregate values, reproducible and testable (SURVEY §2.8).  The
groupBy shuffles once on (keys, window); partial aggregation
(map-side combine) comes free from Catalyst's hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: mode name -> aggregation expression builder (value column, ts column)
_MODES = {
    "sum": lambda v, ts: F.sum(v),
    "count": lambda v, ts: F.count(v),
    "max": lambda v, ts: F.max(v),
    "min": lambda v, ts: F.min(v),
    "mean": lambda v, ts: F.avg(v),
    "stdev": lambda v, ts: F.stddev_pop(v),
    "latest": lambda v, ts: F.max_by(v, ts),
    "earliest": lambda v, ts: F.min_by(v, ts),
    "count_distinct": lambda v, ts: F.countDistinct(v),
    # AggregatedSummary quantiles (metric/value.rs:66): Spark's exact
    # interpolated percentile == DuckDB quantile_cont (oracle-parity)
    "p50": lambda v, ts: F.percentile(v, F.lit(0.5)),
    "p90": lambda v, ts: F.percentile(v, F.lit(0.9)),
    "p95": lambda v, ts: F.percentile(v, F.lit(0.95)),
    "p99": lambda v, ts: F.percentile(v, F.lit(0.99)),
    "approx_p95": lambda v, ts: F.percentile_approx(v, F.lit(0.95)),
    "approx_distinct": lambda v, ts: F.approx_count_distinct(v),
}


def window_start(ts: Column, interval_sec: int) -> Column:
    """Tumbling-window start (epoch-floor; equivalent to
    F.window(ts, ...).start but portable to the DuckDB oracle)."""
    e = F.unix_timestamp(ts)
    return F.timestamp_seconds((e / interval_sec).cast("long") * interval_sec)


def aggregate(
    df: DataFrame,
    keys: list[str],
    specs: dict[str, tuple[str, str]],
    *,
    ts_col: str = "ts",
    interval_sec: int = 60,
    window_col: str = "window_start",
) -> DataFrame:
    """``specs``: out_name -> (mode, value_column).

    Example: {"n": ("count", "*"), "p_sum": ("sum", "latency_ms"),
    "last_status": ("latest", "http_status")}
    """
    ts = F.col(ts_col)
    aggs = []
    for out, (mode, col) in specs.items():
        if mode == "count" and col == "*":
            aggs.append(F.count(F.lit(1)).alias(out))
            continue
        if mode not in _MODES:
            raise ValueError(f"unknown aggregate mode {mode!r}")
        aggs.append(_MODES[mode](F.col(col), ts).alias(out))
    return (
        df.withColumn(window_col, window_start(ts, interval_sec))
        .groupBy(*keys, window_col)
        .agg(*aggs)
    )


def sliding_aggregate(
    df: DataFrame,
    keys: list[str],
    specs: dict[str, tuple[str, str]],
    *,
    ts_col: str = "ts",
    interval_sec: int = 60,
    slide_sec: int = 30,
    window_col: str = "window_start",
) -> DataFrame:
    """Hopping-window variant of :func:`aggregate`: each event lands in
    every ``interval_sec`` window whose start is a multiple of
    ``slide_sec`` covering it (``interval_sec`` must be a multiple of
    ``slide_sec``; equal = tumbling).  The standard telemetry rollup
    Spark exposes as ``window(ts, interval, slide)`` — re-expressed as
    an explicit window-start sequence + ONE explode so the window
    boundaries stay integer-exact and the DuckDB oracle reproduces
    them bit-for-bit (the convention every aggregate query follows).
    Event multiplicity = interval/slide, so output volume scales by
    that fixed factor — map-side combine still applies downstream of
    the explode."""
    if interval_sec % slide_sec != 0:
        raise ValueError(
            f"interval_sec ({interval_sec}) must be a multiple of "
            f"slide_sec ({slide_sec})"
        )
    ts = F.col(ts_col)
    epoch = F.unix_timestamp(ts)
    # newest window containing the event starts at floor(t/slide)*slide;
    # it belongs to interval/slide consecutive slide-aligned windows
    # pmod keeps the alignment floor-like for pre-1970 (negative
    # epoch) timestamps; negative window starts are allowed, matching
    # Spark's window(ts, interval, slide) — every event belongs to
    # exactly interval/slide windows, so the sequence is never empty
    # (round-5 advice: a 0-clamp on first_start alone made the
    # sequence bounds cross for negative epochs and killed the job)
    last_start = (epoch - F.pmod(epoch, F.lit(slide_sec)))
    first_start = last_start - F.lit(interval_sec - slide_sec)
    starts = F.sequence(first_start, last_start, F.lit(slide_sec))
    aggs = []
    for out, (mode, col) in specs.items():
        if mode == "count" and col == "*":
            aggs.append(F.count(F.lit(1)).alias(out))
            continue
        if mode not in _MODES:
            raise ValueError(f"unknown aggregate mode {mode!r}")
        aggs.append(_MODES[mode](F.col(col), ts).alias(out))
    return (
        df.withColumn(
            window_col,
            F.explode(F.transform(
                starts, lambda s: F.timestamp_seconds(s)
            )),
        )
        .groupBy(*keys, window_col)
        .agg(*aggs)
    )


def diff(
    agg_df: DataFrame,
    keys: list[str],
    value_col: str,
    *,
    window_col: str = "window_start",
    out_col: str | None = None,
) -> DataFrame:
    """Aggregate mode Diff — delta vs the previous flush of the same
    series (aggregate.rs:29-75): lag across window boundaries."""
    from pyspark.sql import Window as W

    w = W.partitionBy(*keys).orderBy(window_col)
    out_col = out_col or f"{value_col}_diff"
    return agg_df.withColumn(
        out_col, F.col(value_col) - F.lag(value_col).over(w)
    )


def histogram(
    df: DataFrame,
    value_col: str,
    bucket_width: float,
    keys: list[str] = (),
    *,
    bucket_col: str = "bucket_lo",
) -> DataFrame:
    """AggregatedHistogram (metric/value.rs:51): fixed-width buckets →
    (keys..., bucket_lo, n).  Explicit-edge bucketing keeps the result
    exact and engine-portable (floor(v / width) * width)."""
    lo = (
        F.floor(F.col(value_col) / F.lit(bucket_width)) * F.lit(bucket_width)
    ).alias(bucket_col)
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, lo)
        .agg(F.count(F.lit(1)).alias("n"))
    )
