"""The flagship DAG: parse → enrich → route → aggregate.

This is the BASELINE.json north-star pipeline over the transcripts
table, assembled from the operator library.  Route conditions and
aggregate specs follow FIXTURES.md F3/F4; the whole DAG is lazy — one
cached frame feeds every sink, so Catalyst shares the parse work and
each sink write is a single filtered pass (the reference's
clone-per-match fan-out, /root/reference/src/transforms/route.rs:40-55,
without materializing clones).

Scale notes (100 TB):
- parse + enrich are narrow (no shuffle): regex/JSON extraction in
  whole-stage codegen, broadcast hash join for the lookup.
- the only shuffles are the per-sink windowed aggregations (low-
  cardinality keys, map-side partial agg) — and they run over the
  ALREADY-filtered sink subsets.
- hot-conversation skew is defused by salted repartition before any
  per-conversation work (plans/skew.py); routing itself is key-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from vector_spark.data.lookup import tool_lookup_df
from vector_spark.enrich import enrich
from vector_spark.functions.parse import parse_transcripts, split_errors
from vector_spark.operators.aggregate import aggregate
from vector_spark.operators.route import route

# Route conditions over the parsed+enriched frame (FIXTURES F3).
# Each entry: (spark_condition_sql, duckdb_condition_sql) — kept as SQL
# strings so the two engines provably apply the same predicate.
ROUTE_CONDS: dict[str, tuple[str, str]] = {
    "sink_errors": (
        "parsed.level = 'error' OR parsed.http_status >= 500",
        "level = 'error' OR http_status >= 500",
    ),
    "sink_tools": (
        "role = 'tool' AND tool <> 'none'",
        "role = 'tool' AND tool <> 'none'",
    ),
    "sink_slow": (
        "parsed.latency_ms > 1000 OR parsed.http_bytes > 100000",
        "latency_ms > 1000 OR http_bytes > 100000",
    ),
    "sink_assistant": (
        "role = 'assistant'",
        "role = 'assistant'",
    ),
}

ROUTES: dict[str, str] = {k: v[0] for k, v in ROUTE_CONDS.items()}

# Per-sink tumbling aggregates (FIXTURES F4): 1-minute windows.
AGG_SPECS: dict[str, tuple[str, str]] = {
    "n": ("count", "*"),
    "sum_bytes": ("sum", "parsed.http_bytes"),
    "sum_latency": ("sum", "parsed.latency_ms"),
    "min_latency": ("min", "parsed.latency_ms"),
    "max_latency": ("max", "parsed.latency_ms"),
    "avg_latency": ("mean", "parsed.latency_ms"),
    "n_convs": ("count_distinct", "conv_id"),
}

AGG_INTERVAL_SEC = 60


def enriched_transcripts(
    spark: SparkSession, transcripts: DataFrame, engine: str = "jvm"
) -> tuple[DataFrame, DataFrame]:
    """parse + split error channel + broadcast enrich.

    Returns (enriched_ok, dropped)."""
    parsed = parse_transcripts(transcripts, engine=engine)
    ok, dropped = split_errors(parsed)
    lookup = tool_lookup_df(spark)
    out = enrich(ok, lookup, ["tool", "role"], strict=False)
    return out, dropped


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    *,
    engine: str = "jvm",
    persist: bool = True,
) -> dict[str, DataFrame]:
    """Full DAG.  Returns
    ``{"sinks": {...}, "aggregates": {...}, "dropped": df, "enriched": df}``
    — all lazy except the optional persist of the shared routed input.
    """
    out, dropped = enriched_transcripts(spark, transcripts, engine=engine)
    if persist:
        out = out.persist()
    sinks = route(out, ROUTES)
    aggs = {
        name: aggregate(
            sink,
            keys=[],
            specs=AGG_SPECS,
            ts_col="ts",
            interval_sec=AGG_INTERVAL_SEC,
        )
        for name, sink in sinks.items()
        if name != "_unmatched"
    }
    return {
        "enriched": out,
        "dropped": dropped,
        "sinks": sinks,
        "aggregates": aggs,
    }
