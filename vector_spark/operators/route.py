"""route / exclusive_route / filter — condition-driven fan-out.

Reference semantics:
- ``route``: NON-exclusive — an event is cloned into every output port
  whose condition matches; if none match it goes to ``_unmatched``
  (/root/reference/src/transforms/route.rs:40-55, :17).
- ``exclusive_route``: first-match-wins over an ordered route list
  (/root/reference/src/transforms/exclusive_route/transform.rs:46-58).
- ``filter``: keep matching rows, silently drop the rest
  (/root/reference/src/transforms/filter.rs:94-103).

Spark design: the input frame is computed once (caller may persist);
each port is a lazily-filtered view — Catalyst pushes each port's
predicate into the shared scan, and a single pass per sink write is the
scale-correct plan (no row cloning materialized; multiplicity appears
only at the sinks, exactly like the reference's clone-per-match).
``exclusive_route`` is a single projection with a ``when``-chain —
one pass total, ideal for a partitioned write by route name.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from vector_spark.conditions import to_condition

UNMATCHED = "_unmatched"


def filter_events(df: DataFrame, cond: Column | str | bool) -> DataFrame:
    return df.filter(to_condition(cond))


def route(
    df: DataFrame,
    routes: dict[str, Column | str | bool],
    reroute_unmatched: bool = True,
    *,
    cache: bool = False,
) -> dict[str, DataFrame]:
    """Non-exclusive fan-out: ``{port: filtered_view}``.

    Every port whose condition matches receives the row (clone-per-match
    multiplicity across ports).  ``_unmatched`` receives rows matching
    no port when ``reroute_unmatched`` (default true, mirroring
    route.rs).

    ``cache=True`` persists the input (MEMORY_AND_DISK) so that writing
    every port does not re-evaluate the upstream DAG once per sink.
    The CALLER owns the unpersist (the config runner persists at its
    own layer and unpersists after the per-port actions); when all
    sinks share one schema, the single-pass :func:`route_tag_column` +
    explode encoding avoids the multi-action shape entirely.
    """
    if UNMATCHED in routes:
        raise ValueError(f"{UNMATCHED!r} is a reserved port name")
    if cache:
        df = df.persist()
    conds = {name: to_condition(c) for name, c in routes.items()}
    out = {name: df.filter(c) for name, c in conds.items()}
    if reroute_unmatched:
        # three-valued logic: a NULL condition is "no match", so the
        # unmatched port needs NOT(coalesce(c, false)) per condition —
        # plain ~(c1|c2|...) would drop NULL-condition rows entirely
        none_match = F.lit(True)
        for c in conds.values():
            none_match = none_match & ~F.coalesce(c, F.lit(False))
        out[UNMATCHED] = df.filter(none_match)
    return out


def route_tag_column(
    routes: dict[str, Column | str | bool], reroute_unmatched: bool = True
) -> Column:
    """Array-of-matched-port-names column — the single-pass encoding of
    non-exclusive routing (explode it + partitionBy(route) when all
    sinks share a schema)."""
    pairs = [
        F.when(to_condition(c), F.lit(name)) for name, c in routes.items()
    ]
    arr = F.array_compact(F.array(*pairs))
    if reroute_unmatched:
        arr = F.when(F.size(arr) == 0, F.array(F.lit(UNMATCHED))).otherwise(arr)
    return arr


def exclusive_route(
    df: DataFrame,
    routes: list[tuple[str, Column | str | bool]],
    route_col: str = "_route",
) -> DataFrame:
    """First-match-wins: ONE pass, adds ``route_col``; write with
    ``partitionBy(route_col)`` for the per-sink fan-out."""
    expr: Column | None = None
    for name, c in routes:
        clause = F.when(to_condition(c), F.lit(name))
        expr = clause if expr is None else expr.when(to_condition(c), F.lit(name))
    expr = (expr if expr is not None else F.lit(None)).otherwise(F.lit(UNMATCHED))
    return df.withColumn(route_col, expr)


def _any(conds: list[Column]) -> Column:
    out = F.lit(False)
    for c in conds:
        out = out | c
    return out
