"""dedupe — drop events whose fingerprint was already seen.

Reference: LRU cache of ``num_events`` fingerprints over ``match``
fields (default ``timestamp, host, message``) or all-but-``ignore``
fields (/root/reference/src/transforms/dedupe/transform.rs:17-20,76-84;
field config common.rs:38-60).

Batch re-specification (SURVEY §4): the LRU's cache-size-dependent
recency semantics are nondeterministic under reordering; we adopt
first-occurrence-wins over a deterministic order (the stable turn
ordering), optionally scoped to a time window — equivalent results for
any cache large enough to hold the window.  Implementation is one
shuffle on the match key + row_number (no driver state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def dedupe(
    df: DataFrame,
    match: list[str] | None = None,
    ignore: list[str] | None = None,
    *,
    order_by: list[str] | None = None,
    window_col: str | None = None,
) -> DataFrame:
    """Keep the first occurrence per fingerprint.

    - ``match``: fields forming the fingerprint (match mode)
    - ``ignore``: fingerprint = all columns except these (ignore mode)
    - ``order_by``: deterministic first-ness (default: ts, turn order)
    - ``window_col``: optional column scoping the cache to a time
      window (the `max_age_ms` analogue)
    """
    if (match is None) == (ignore is None):
        raise ValueError("exactly one of match/ignore must be given")
    cols = match if match is not None else [
        c for c in df.columns if c not in set(ignore or [])
    ]
    part = cols + ([window_col] if window_col else [])
    order = order_by or [c for c in ("ts", "conv_id", "turn_idx") if c in df.columns]
    if not order:
        order = cols
    w = W.partitionBy(*part).orderBy(*order)
    return (
        df.withColumn("_dd_rn", F.row_number().over(w))
        .filter(F.col("_dd_rn") == 1)
        .drop("_dd_rn")
    )
