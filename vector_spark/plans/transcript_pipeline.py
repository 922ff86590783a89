"""The flagship DAG: parse → enrich → route → aggregate.

This is the BASELINE.json north-star pipeline over the transcripts
table, assembled from the operator library.  Route conditions and
aggregate specs follow FIXTURES.md F3/F4; the whole DAG is lazy — one
cached frame feeds every sink, so Catalyst shares the parse work and
each sink write is a single filtered pass (the reference's
clone-per-match fan-out, /root/reference/src/transforms/route.rs:40-55,
without materializing clones).

Scale notes (100 TB):
- parse + enrich are narrow (no shuffle): one regex/JSON extraction in
  whole-stage codegen per row, broadcast hash join for the lookup.
- after enrich the frame is PROJECTED FLAT and the raw `text` column is
  dropped before persisting — the fan-out cache holds only the columns
  the sinks read (caching the raw text tripled the pipeline cost).
- the only shuffles are the per-sink windowed aggregations (low-
  cardinality keys, map-side partial agg) over already-filtered rows.
- hot-conversation skew is defused by salted repartition before any
  per-conversation work (plans/skew.py); routing itself is key-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from vector_spark.data.lookup import tool_lookup_df
from vector_spark.enrich import enrich
from vector_spark.functions.parse import parse_transcripts, split_errors
from vector_spark.operators.aggregate import aggregate
from vector_spark.operators.route import route

#: Route conditions over the flat parsed+enriched frame (FIXTURES F3).
#: One SQL string per sink, valid in BOTH Spark and DuckDB — the two
#: engines provably apply the same predicate.
ROUTE_CONDS: dict[str, str] = {
    "sink_errors": "level = 'error' OR http_status >= 500",
    "sink_tools": "role = 'tool' AND tool <> 'none'",
    "sink_slow": "latency_ms > 1000 OR http_bytes > 100000",
    "sink_assistant": "role = 'assistant'",
}

ROUTES = ROUTE_CONDS

#: Per-sink tumbling aggregates (FIXTURES F4): 1-minute windows.
AGG_SPECS: dict[str, tuple[str, str]] = {
    "n": ("count", "*"),
    "sum_bytes": ("sum", "http_bytes"),
    "sum_latency": ("sum", "latency_ms"),
    "min_latency": ("min", "latency_ms"),
    "max_latency": ("max", "latency_ms"),
    "n_convs": ("count_distinct", "conv_id"),
}

AGG_INTERVAL_SEC = 60

#: flat pipeline schema: transcript keys + enrichment + parsed fields
FLAT_COLS = ["conv_id", "turn_idx", "role", "tool", "ts", "team", "cost_weight"]


def enriched_transcripts(
    spark: SparkSession,
    transcripts: DataFrame,
    engine: str = "jvm",
    *,
    flat: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """parse + split error channel + broadcast enrich.

    Returns (enriched_ok, dropped).  With ``flat`` (the pipeline
    default) the parsed struct is flattened to top-level columns and
    raw ``text`` is dropped — the shape every downstream stage wants,
    and the shape worth caching."""
    parsed = parse_transcripts(transcripts, engine=engine)
    ok, dropped = split_errors(parsed)
    lookup = tool_lookup_df(spark)
    out = enrich(ok, lookup, ["tool", "role"], strict=False)
    if flat:
        out = out.select(*FLAT_COLS, "format", "parsed.*")
    return out, dropped


def fused_aggregates(
    df: DataFrame,
    routes: dict[str, str] | None = None,
    specs: dict[str, tuple[str, str]] | None = None,
    *,
    interval_sec: int = AGG_INTERVAL_SEC,
) -> DataFrame:
    """All per-sink windowed aggregates in ONE scan + ONE shuffle.

    The single-pass encoding of non-exclusive route: each row carries
    the array of sinks it matches (clone-per-match multiplicity),
    explode() fans it out, and one groupBy (sink, window) computes every
    sink's aggregate.  At scale this replaces S separate scan+shuffle
    jobs with one job keyed by (sink, window) — the plan you want for
    the aggregate leg of the DAG, while row-level sink writes keep the
    filtered-view form.
    """
    from pyspark.sql import functions as F

    from vector_spark.operators.route import route_tag_column

    routes = routes or ROUTES
    specs = specs or AGG_SPECS
    tags = route_tag_column(routes, reroute_unmatched=False)
    exploded = df.withColumn("sink", F.explode(tags))
    return aggregate(
        exploded,
        keys=["sink"],
        specs=specs,
        ts_col="ts",
        interval_sec=interval_sec,
    )


def pipeline_stats(
    spark: SparkSession,
    transcripts: DataFrame,
    *,
    engine: str = "jvm",
    interval_sec: int = AGG_INTERVAL_SEC,
    exact_distinct: bool = True,
) -> DataFrame:
    """The ENTIRE pipeline's per-sink windowed stats as ONE Spark job.

    parse → enrich → route-tag → explode → one groupBy (sink, window).
    Rows that fail parsing land in sink '_dropped', rows matching no
    route in '_unmatched' — so a single scan + single shuffle yields
    every sink's aggregates plus both bookkeeping counts.  No persist,
    no repeated passes: the minimal-serial-fraction plan that keeps
    scaling efficiency high on a cluster (and in the N-vs-4N-core
    benchmark).

    ``exact_distinct=False`` swaps the n_convs count-distinct for the
    HLL-based approx_count_distinct: the exact distinct is what forces
    the second shuffle (partial on (sink, window, conv_id)), so the
    approx plan is ONE shuffle end-to-end — the 100 TB default, where
    a ±2% cardinality is the right trade for halving data movement.
    """
    from pyspark.sql import functions as F

    from vector_spark.operators.route import route_tag_column

    parsed = parse_transcripts(transcripts, engine=engine)
    lookup = tool_lookup_df(spark)
    enriched = enrich(parsed, lookup, ["tool", "role"], strict=False)
    flat = enriched.select(
        *FLAT_COLS, "format", "parse_ok", "parsed.*"
    )
    tags = F.when(
        F.col("parse_ok"), route_tag_column(ROUTES, reroute_unmatched=True)
    ).otherwise(F.array(F.lit("_dropped")))
    exploded = flat.withColumn("sink", F.explode(tags))
    specs = dict(AGG_SPECS)
    if not exact_distinct:
        specs["n_convs"] = ("approx_distinct", "conv_id")
    return aggregate(
        exploded,
        keys=["sink"],
        specs=specs,
        ts_col="ts",
        interval_sec=interval_sec,
    )


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
