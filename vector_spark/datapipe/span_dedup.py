"""Exact-substring (span-level) dedup — the ExactSubstr method of
"Deduplicating Training Data Makes Language Models Better" (Lee et al.
2022), re-expressed Spark-first: instead of their suffix array over the
concatenated corpus (a single-machine construction), duplicated spans
are found as repeated rolling word-k-grams — every length->=k repeated
substring contains a repeated k-gram, so k-gram repetition is exactly
the ExactSubstr duplication signal at the chosen granularity.

Plan shape (all linear, no pair join anywhere):
- posexplode the normalized word array into (doc, pos, span_hash) for
  the n - k + 1 rolling k-grams — same per-doc explosion factor as the
  MinHash shingle path;
- one groupBy(span_hash) counts occurrences; spans with total count
  >= min_count (default 2 — ANY repeat, the ExactSubstr rule) are
  duplicated content;
- a broadcast-threshold-free semi join marks each doc's duplicated
  span positions (8-byte keys, no strings past the hash step);
- per-doc MERGED-INTERVAL coverage via a bounded window
  (partitionBy(doc), ordered by position, running max of span ends):
  ``covered_i = max(0, end_i - max(start_i, prev_max_end + 1) + 1)``
  sums to the exact union length without exploding each span into its
  k positions (a 50x row blowup at the paper's k=50).  Window
  cardinality is bounded by document length — the established
  per-conversation window discipline.

Everything is integer/Column-expression arithmetic on md5-prefix
hashes, so the DuckDB oracle replays it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from vector_spark.datapipe.dedup import normalize_text, portable_hash60


def _span_rows(
    df: DataFrame, *, k: int, text_col: str, id_col: str
) -> DataFrame:
    """(id, pos, span_h) for every rolling word-k-gram; docs shorter
    than k words yield nothing (no k-span exists)."""
    ws = F.split(normalize_text(F.col(text_col)), " ")
    n_spans = F.size(ws) - (k - 1)
    spans = F.transform(
        F.sequence(F.lit(1), n_spans),
        lambda i: F.struct(
            (i - 1).alias("pos"),
            portable_hash60(
                F.concat_ws(" ", F.slice(ws, i, k))
            ).alias("span_h"),
        ),
    )
    return (
        # docs shorter than k words are filtered BEFORE the transform:
        # sequence(1, 0) would otherwise DESCEND and feed slice a 0
        df.filter(n_spans >= 1)
        .select(F.col(id_col), F.explode(spans).alias("_s"))
        .select(id_col, F.col("_s.pos").alias("pos"),
                F.col("_s.span_h").alias("span_h"))
    )


def duplicated_spans(
    df: DataFrame,
    *,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> DataFrame:
    """(id, pos, span_h) rows for every span whose k-gram occurs
    ``min_count`` or more times in the WHOLE corpus (including repeats
    inside one document — the ExactSubstr rule)."""
    spans = _span_rows(df, k=k, text_col=text_col, id_col=id_col)
    dup = (
        spans.groupBy("span_h")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= int(min_count))
        .select("span_h")
    )
    return spans.join(dup, "span_h", "semi")


def span_dedup_stats(
    df: DataFrame,
    *,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> DataFrame:
    """Per-document duplication report: ``(id, n_tokens, dup_tokens,
    dup_frac_milli)`` where ``dup_tokens`` is the EXACT number of word
    positions covered by at least one duplicated span (merged-interval
    union, see module docstring) and ``dup_frac_milli`` the integer
    per-mille fraction.  Docs with fewer than k words report 0 (no
    span can exist — the documented pass-out; NULL text is excluded).

    This is the removal planner's input: ExactSubstr-style pipelines
    cut the covered ranges (plus a guard margin) out of the text; the
    covered-interval rows themselves come from
    :func:`duplicated_spans`.
    """
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.size(F.split(normalize_text(F.col(text_col)), " ")).alias(
            "n_tokens"
        ),
    )
    dups = duplicated_spans(
        df, k=k, text_col=text_col, id_col=id_col, min_count=min_count
    )
    w = (
        W.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    end = F.col("pos") + (k - 1)
    prev_end = F.max(end).over(w)
    covered = F.greatest(
        F.lit(0),
        end
        - F.greatest(F.col("pos"), F.coalesce(prev_end + 1, F.col("pos")))
        + 1,
    )
    per_doc = (
        dups.withColumn("_cov", covered)
        .groupBy(id_col)
        .agg(F.sum("_cov").alias("dup_tokens"))
    )
    return (
        base.join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.floor(
                F.coalesce("dup_tokens", F.lit(0))
                * 1000
                / F.greatest("n_tokens", F.lit(1))
            ).cast("long").alias("dup_frac_milli"),
        )
    )
