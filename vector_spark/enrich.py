"""Enrichment tables — broadcast lookup joins.

Reference: trait ``Table::find_table_row(s)`` with conjunctions of
``Condition::{Equals, BetweenDates, FromDate, ToDate}`` — i.e. an
equi-join with an optional date-interval predicate
(/root/reference/lib/vector-vrl/enrichment/src/lib.rs:24-43,105-148);
the single-row variant errors with NoRowsFound/MoreThanOneRowFound
(lib.rs:53-57).  The CSV file table builds a hash index over the keyed
fields (/root/reference/src/enrichment_tables/file.rs:421-526).

Spark design: the lookup side is small by construction (dimension
data), so the hash index is a broadcast hash join — Catalyst builds the
hash table once per executor, no shuffle of the fact side.  The
MoreThanOneRowFound contract becomes a load-time uniqueness assertion
(cheap: one agg over the small side) so the join can never fan out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


class EnrichmentError(ValueError):
    pass


def assert_unique_key(lookup: DataFrame, keys: list[str]) -> None:
    """MoreThanOneRowFound at load time: fail fast if any key duplicates."""
    dup = (
        lookup.groupBy(*keys)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise EnrichmentError(
            f"MoreThanOneRowFound: duplicate lookup key {tuple(dup[0][:-1])}"
        )


def enrich(
    fact: DataFrame,
    lookup: DataFrame,
    keys: list[str],
    *,
    date_col: str | None = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    strict: bool = True,
    how: str = "left",
) -> DataFrame:
    """Broadcast equi-join (+ optional date-range predicate).

    ``date_col`` enables the BetweenDates variant: the fact row's
    timestamp must fall in [valid_from, valid_to] on the lookup row.
    Unmatched fact rows keep null enrichment columns (the NoRowsFound
    analogue; filter them if the pipeline wants hard failure).
    """
    if strict:
        assert_unique_key(lookup, keys)
    right = F.broadcast(lookup)
    if date_col is None:
        joined = fact.join(right, on=keys, how=how)
        return joined
    cond: Column = F.lit(True)
    for k in keys:
        cond = cond & (fact[k] == lookup[k])
    cond = cond & fact[date_col].between(lookup[valid_from], lookup[valid_to])
    joined = fact.join(right, on=cond, how=how)
    # drop the duplicated key columns from the lookup side
    return joined.drop(*[lookup[k] for k in keys])


def find_enrichment_records(
    fact: DataFrame,
    lookup: DataFrame,
    keys: list[str],
    *,
    as_array: str | None = None,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """VRL ``find_enrichment_table_records``: ALL matching lookup rows
    per event (the multi-row sibling of :func:`enrich`, which asserts
    uniqueness — lib/vector-vrl/enrichment/src/lib.rs:46-52).

    Default rendering is the relational one — a broadcast left join
    that fans out one output row per match (unmatched rows keep nulls).
    Pass ``as_array="matches"`` (+ ``id_cols``, the fact's key columns)
    to keep event cardinality instead: matches are gathered into an
    array<struct> column via one groupBy over ``id_cols``."""
    joined = fact.join(F.broadcast(lookup), on=keys, how="left")
    if as_array is None:
        return joined
    if not id_cols:
        raise ValueError("as_array needs id_cols to restore event rows")
    attr_cols = [c for c in lookup.columns if c not in keys]
    if not attr_cols:
        raise ValueError("lookup has no attribute columns beyond the keys")
    fact_cols = [c for c in fact.columns if c not in id_cols]

    def _any_attr_set(s: Column) -> Column:
        # a left-join miss contributes one all-null struct: drop it
        cond = s[attr_cols[0]].isNotNull()
        for c in attr_cols[1:]:
            cond = cond | s[c].isNotNull()
        return cond

    return joined.groupBy(*id_cols).agg(
        *[F.first(c).alias(c) for c in fact_cols],
        F.filter(
            F.collect_list(F.struct(*attr_cols)), _any_attr_set
        ).alias(as_array),
    )


def load_csv_lookup(spark, path: str, schema: str) -> DataFrame:
    """CSV enrichment table with explicit typed schema — the analogue of
    file.rs's `string|date|timestamp|int|float|bool` coercion (no
    inferSchema; production tables declare types)."""
    return spark.read.csv(path, header=True, schema=schema)


def enrich_ip_ranges(
    fact: DataFrame,
    ranges: DataFrame,
    ip_col: str,
    *,
    lo_col: str = "ip_lo",
    hi_col: str = "ip_hi",
    how: str = "bucketed",
    bucket_bits: int = 16,
) -> DataFrame:
    """Geoip-style enrichment: ip ∈ [ip_lo, ip_hi] range lookup
    (the mmdb point-lookup of /root/reference/src/enrichment_tables/
    geoip.rs re-expressed relationally; ranges carry the attributes).

    - ``broadcast``: non-equi broadcast join — fine when the ranges
      table is small (a nested-loop probe per row).
    - ``bucketed`` (default): the 100 TB path — each range row is
      exploded across the /``bucket_bits`` prefixes it covers, the fact
      ip joins its prefix with a HASH join, then the exact range filter
      applies.  Turns O(rows × ranges) into O(rows + covered-buckets).
    """
    from vector_spark.functions.vrl import ip_to_long

    ip = ip_to_long(F.col(ip_col)).alias("_ip")
    f = fact.withColumn("_ip", ip_to_long(F.col(ip_col)))
    if how == "broadcast":
        cond = (F.col("_ip") >= ranges[lo_col]) & (F.col("_ip") <= ranges[hi_col])
        return f.join(F.broadcast(ranges), on=cond, how="left").drop("_ip")
    if how != "bucketed":
        raise ValueError(f"unknown range-join strategy {how!r}")
    shift = 32 - bucket_bits
    bucketed_ranges = ranges.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.shiftright(F.col(lo_col), shift),
                F.shiftright(F.col(hi_col), shift),
            )
        ),
    )
    fb = f.withColumn("_bucket", F.shiftright(F.col("_ip"), shift))
    joined = fb.join(
        F.broadcast(bucketed_ranges),
        on=(
            (fb["_bucket"] == bucketed_ranges["_bucket"])
            & (fb["_ip"] >= bucketed_ranges[lo_col])
            & (fb["_ip"] <= bucketed_ranges[hi_col])
        ),
        how="left",
    )
    return joined.drop(bucketed_ranges["_bucket"]).drop("_bucket", "_ip")
