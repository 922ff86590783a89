"""sample — keep 1/N events, optionally consistent per key / per group.

Reference: keep every Nth event (``rate``) or a ``ratio``; with
``key_field`` the decision is seahash(key) % rate == 0 (CONSISTENT
sampling — same key always same decision); ``group_by`` gives
independent counters per group; ``exclude`` bypasses sampling; the kept
events are stamped with ``sample_rate``
(/root/reference/src/transforms/sample/config.rs:59-127,
transform.rs:62-93).

Spark design: the arrival-order counter mode is order-dependent and not
reproducible on a distributed engine, so the deterministic hash mode is
the primary implementation (xxhash64 in place of seahash — both are
just fixed 64-bit hashes; the contract is consistency, not a specific
hash).  ``sample_mod`` offers an arithmetic variant portable to the
SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from vector_spark.conditions import to_condition


def sample(
    df: DataFrame,
    rate: int,
    key_field: str | None = None,
    *,
    group_by: list[str] | None = None,
    exclude: Column | str | bool | None = None,
    stamp: bool = True,
    portable: bool = False,
) -> DataFrame:
    """Hash-consistent 1-in-``rate`` sampling.

    Hash input = (group_by..., key) so each group samples independently
    (the per-group counter analogue).  ``portable=True`` swaps
    xxhash64 for the md5-prefix hash both engines can compute, putting
    the whole decision under the DuckDB oracle gate.
    """
    key_cols: list[Column] = [F.col(c) for c in (group_by or [])]
    if key_field:
        key_cols.append(F.col(key_field))
    if not key_cols:
        key_cols = [F.monotonically_increasing_id()]
    if portable:
        from vector_spark.datapipe.dedup import portable_hash60

        h = portable_hash60(F.concat_ws("|", *key_cols))
    else:
        h = F.xxhash64(*key_cols)
    keep = F.pmod(h, F.lit(rate)) == 0
    if exclude is not None:
        keep = keep | to_condition(exclude)
    out = df.filter(keep)
    if stamp:
        out = out.withColumn("sample_rate", F.lit(rate))
    return out


def sample_mod(
    df: DataFrame,
    rate: int,
    key_expr: Column,
    *,
    stamp: bool = True,
) -> DataFrame:
    """Deterministic modulus sampling over a numeric key expression —
    engine-portable (used by the DuckDB oracle gate)."""
    out = df.filter(F.pmod(key_expr, F.lit(rate)) == 0)
    if stamp:
        out = out.withColumn("sample_rate", F.lit(rate))
    return out


def sample_ratio(df: DataFrame, ratio: float, seed: int = 42) -> DataFrame:
    """Bernoulli ratio sampling (non-key mode) — Spark-native."""
    return df.sample(fraction=ratio, seed=seed)


def sample_ratio_hash(
    df: DataFrame,
    ratio: float,
    key_expr: Column,
    *,
    stamp: bool = True,
) -> DataFrame:
    """Deterministic ``ratio`` sampling: keep when the portable hash of
    the key lands in the first ``ratio`` slice of [0, 1e6) — the
    reproducible (and oracle-checkable) analogue of the reference's
    random ratio mode (sample/config.rs `ratio`)."""
    from vector_spark.datapipe.dedup import portable_hash60

    out = df.filter(
        F.pmod(portable_hash60(key_expr), F.lit(1_000_000))
        < int(ratio * 1_000_000)
    )
    if stamp:
        out = out.withColumn("sample_rate", F.lit(1.0 / ratio))
    return out
