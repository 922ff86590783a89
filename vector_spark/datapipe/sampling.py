"""Training-mix sampling: temperature-rebalanced source mixing and
per-group token-budget quota sampling — the two rate-control ops a
training-data pipeline runs after filtering/dedup to shape the final
mix (cf. the sampling-temperature mixes of multilingual pretraining
and per-domain token budgets of curated corpora).

Both are DETERMINISTIC: keep decisions hash on the doc id (the
portable md5-prefix hash the DuckDB oracle can recompute), so the
sample is reproducible across runs, engines, partitionings, and
cluster sizes — the property that makes a 100 TB sampling job
resumable and auditable.

Scale design:
- ``temperature_mix``: per-group keep rates come from one tiny
  groupBy (one row per group) crossJoined against a one-row total —
  broadcast back; the corpus side is a single narrow filter, no
  shuffle of the big side at all.
- ``quota_sample`` needs an ORDERED prefix sum within each group
  (keep docs in hash order until the token budget fills).  A plain
  window ``partitionBy(group)`` would pull an entire group — billions
  of rows for a dominant language — through ONE task, so the prefix
  sum is two-phase like :mod:`vector_spark.datapipe.packing`: the
  order key IS the hash, so deterministic hash-RANGE buckets
  subdivide each group; per-(group, bucket) totals collect to the
  driver (bounded: groups × n_buckets rows), exclusive bucket offsets
  broadcast back, and the cumsum window partitions by
  (group, bucket) — parallel across buckets, never a whole group in
  one task.  The result depends only on (hash order, token counts),
  never on bucketing, so a plain global-window DuckDB oracle
  reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from vector_spark.datapipe.dedup import portable_hash60
from vector_spark.datapipe.text import token_count

#: keep-rate granularity for temperature_mix: thresholds are
#: round(p * 1000) against hash % 1000 — coarse enough that an
#: ulp-level float divergence between engines cannot flip a threshold
TEMP_GRANULARITY = 1000

#: width of :func:`portable_hash60`'s output — the quota prefix sum
#: buckets on the hash's top ``n_bucket_bits`` bits (shift = 60 - bits)
HASH_BITS = 60


def _id_hash(id_col: str) -> Column:
    return portable_hash60(F.col(id_col).cast("string"))


def temperature_rates(
    df: DataFrame,
    group_col: str,
    *,
    alpha: float = 0.5,
    target_frac: float = 0.6,
) -> DataFrame:
    """Per-group keep thresholds for :func:`temperature_mix`:
    ``w_i ∝ n_i^alpha`` (alpha < 1 flattens the mix toward uniform,
    alpha = 1 keeps natural proportions), group i's target row count
    is ``w_i / Σw · target_frac · N`` capped at ``n_i`` (a filter
    cannot upsample — rare groups saturate at keep-all, which is
    exactly the intended temperature behavior), and the keep
    probability ``p_i = target_i / n_i`` becomes an integer threshold
    ``round(p_i · 1000)``.  One tiny aggregate (a row per group) — the
    corpus is not touched beyond the count.

    Rows with a NULL group are outside the mix entirely: excluded from
    the counts here (so they don't consume target mass the join in
    :func:`temperature_mix` would then silently discard) and absent
    from the output."""
    counts = (
        df.filter(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).cast("double").alias("_n"))
    )
    # the totals are an unpartitioned window over the COUNTS frame —
    # one row per group, so the single-partition window is trivial
    # (never over the corpus itself)
    everything = W.partitionBy()
    w_i = F.pow("_n", F.lit(alpha))
    p = F.least(
        F.lit(1.0),
        w_i / F.sum(w_i).over(everything)
        * F.lit(target_frac) * F.sum("_n").over(everything) / F.col("_n"),
    )
    return counts.select(
        group_col,
        F.col("_n").cast("long").alias("group_rows"),
        F.round(p * TEMP_GRANULARITY, 0).cast("long").alias("keep_thr"),
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    *,
    alpha: float = 0.5,
    target_frac: float = 0.6,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-rebalanced downsampling: keep each row of group i
    iff ``hash(id) % 1000 < keep_thr_i``.  Hash-consistent (same doc →
    same decision on every run/engine/cluster size) and a single
    narrow filter over the corpus after a broadcast join of the tiny
    rates table — the 100 TB side never shuffles.  NULL-group rows are
    dropped (no rate to apply; their mass never entered the rate
    computation) — pre-bucket them explicitly if they belong in the
    mix."""
    rates = temperature_rates(
        df, group_col, alpha=alpha, target_frac=target_frac
    ).select(group_col, "keep_thr")
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(F.pmod(_id_hash(id_col), F.lit(TEMP_GRANULARITY)) < F.col("keep_thr"))
        .drop("keep_thr")
    )


#: split granularity: 1e-6 fraction resolution
SPLIT_GRANULARITY = 1_000_000


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    *,
    id_col: str = "doc_id",
    group_col: str | None = None,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row gets the
    split whose cumulative weight bracket contains
    ``hash(salt:unit) % 1e6``.  With ``group_col`` the hash unit is
    the GROUP (all docs of a conversation/domain land in the same
    split — the leak-free discipline when near-duplicates cluster
    within groups); otherwise the row id.  Purely narrow (a map over
    the scan, zero shuffles, nothing collected), so it costs one
    column at 100 TB; hashing on content ids, not partition position,
    makes the assignment stable under repartitioning, resumable
    re-runs, and engine swaps.  ``salt`` namespaces independent
    re-splits of the same corpus.  A NULL hash unit gets a NULL split
    (every NULL would otherwise hash identically and pile into one
    arbitrary bucket, silently skewing whichever split caught them) —
    filter or assign those rows explicitly."""
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative with at least one entry")
    tot = float(sum(weights.values()))
    if tot <= 0:
        raise ValueError("weights must sum to a positive value")
    names = list(weights)
    # integer cumulative thresholds; the last is forced to the full
    # granularity so rounding never leaves an unassigned sliver
    cum, thr = 0.0, []
    for name in names:
        cum += weights[name] / tot
        thr.append(round(cum * SPLIT_GRANULARITY))
    thr[-1] = SPLIT_GRANULARITY

    unit = F.col(group_col) if group_col else F.col(id_col)
    h = F.pmod(
        portable_hash60(F.concat_ws(":", F.lit(salt), unit.cast("string"))),
        F.lit(SPLIT_GRANULARITY),
    )
    expr = F.lit(names[-1])
    for name, t in list(zip(names, thr))[-2::-1]:
        expr = F.when(h < t, F.lit(name)).otherwise(expr)
    expr = F.when(unit.isNull(), F.lit(None).cast("string")).otherwise(expr)
    return df.withColumn(split_col, expr)


def quota_sample(
    df: DataFrame,
    *,
    group_col: str = "lang",
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_col: str | None = None,
    n_bucket_bits: int = 6,
) -> DataFrame:
    """Per-group token-budget sampling: within each group, visit docs
    in portable-hash order (a deterministic shuffle — no temporal or
    positional bias) and keep while the EXCLUSIVE token prefix sum is
    under ``budget`` (every non-empty group keeps at least one doc;
    the last kept doc may straddle the budget, standard quota
    semantics).  Returns the kept rows plus ``n_tokens`` and
    ``token_offset`` (the doc's first-token position in its group's
    budget).

    Two-phase prefix sum over hash-range buckets — see the module
    docstring for why ``partitionBy(group)`` alone would serialize a
    dominant group through one task.  ``token_col`` supplies real
    tokenizer counts; the default is the whitespace count over
    normalized text.  Rows with a NULL group are excluded (no budget
    to charge them against) — pre-bucket them explicitly if needed.
    """
    from vector_spark.datapipe.packing import bucketed_prefix_sum

    if not 1 <= n_bucket_bits <= 20:
        raise ValueError(f"n_bucket_bits must be in [1, 20], got {n_bucket_bits}")
    toks: Column = (
        token_count(F.col(text_col)) if token_col is None
        else F.col(token_col)
    )
    h = _id_hash(id_col)
    d = df.filter(F.col(group_col).isNotNull()).withColumns(
        {
            "_h": h,
            # top bits of the hash: bucket order == hash order, so the
            # per-bucket cumsum + bucket offsets IS the global
            # hash-order prefix within each group
            "_b": F.shiftright(h, HASH_BITS - n_bucket_bits),
            "n_tokens": F.coalesce(toks.cast("long"), F.lit(0)),
        }
    )
    summed = bucketed_prefix_sum(
        d, bucket_col="_b", order_cols=["_h", id_col],
        value_col="n_tokens", partition_cols=[group_col],
        out_col="token_offset",
    )
    if summed is None:
        return d.withColumn(
            "token_offset", F.lit(None).cast("long")
        ).filter(F.lit(False)).drop("_h", "_b")
    return (
        summed.filter(F.col("token_offset") < budget).drop("_h", "_b")
    )
