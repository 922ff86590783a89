"""Model-based quality filtering: a hashed linear classifier with
closed-form Naive-Bayes log-odds weights (the NBSVM recipe — the
same shape as the fastText classifiers DCLM/fineweb-edu run at corpus
scale: per-token weight lookup + one sum per document), and an exact
top-k-per-group selector that never sorts a hot group through a
single task.

Spark-first shapes:
- Training is TWO groupBys over the labeled seed set (per-class token
  counts), closed form — no iterative optimizer, no driver loop.  The
  weight table is (token_h: 8 bytes, w_milli: int) and broadcasts.
- Scoring is explode → hash → broadcast-join → one groupBy(doc).
  The 100 TB corpus side is never shuffled on strings.
- Selection thresholds come from a per-(group, score) histogram — a
  bounded, map-side-combinable aggregate — so only the ~k survivors
  of each group ever reach the exact rank window.

Engine-portability discipline (matches datapipe/lm.py): every weight
rounds to integer milli-units before any arithmetic that crosses rows,
so scores are exact integer sums and the DuckDB oracle reproduces
every comparison bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from vector_spark.datapipe.dedup import portable_hash60
from vector_spark.datapipe.lm import SCORE_SCALE, _tokens


def _class_logp(counts: DataFrame, alpha: float) -> Column:
    """Smoothed in-class log-probability ln((c + a) / (T + a*(V+1)))
    over a (token_h, _c) frame's aggregate columns (_t, _v)."""
    return F.log(
        (F.coalesce(F.col("_c"), F.lit(0.0)) + F.lit(alpha))
        / (F.col("_t") + F.lit(alpha) * (F.col("_v") + 1))
    )


def nb_logodds_weights(
    labeled: DataFrame,
    *,
    label_col: str = "label",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Closed-form Naive-Bayes log-odds token weights from a labeled
    seed set: ``w(t) = ln p(t|pos) - ln p(t|neg)`` with add-``alpha``
    smoothing and one reserved out-of-vocabulary type per class (the
    ``+ 1`` in the denominator), the NBSVM linear weights (Wang &
    Manning 2012).  Returns ``(token_h, w_milli)`` with ONE
    ``token_h IS NULL`` row carrying the OOV weight — NULL never
    matches an equi-join key, so the sentinel rides along invisibly
    (same convention as lm.unigram_lm).

    ``label_col`` is boolean-ish: truthy rows are the positive class.
    The vocabulary is the union of both classes, so every in-vocab
    token has a weight from the SAME closed form (a token seen only in
    one class still contrasts against the other's smoothed floor).
    Weights round to integer millis so downstream sums are exact.
    """
    toks = (
        # NULL labels are IGNORED (not defaulted into the negative
        # class): their tokens must enter neither class count nor the
        # vocabulary, else they would surface as NULL weights that
        # silently score as OOV
        labeled.filter(F.col(label_col).isNotNull())
        .select(
            F.col(label_col).cast("boolean").alias("_pos"),
            F.explode(_tokens(text_col)).alias("_w"),
        )
        .select("_pos", portable_hash60(F.col("_w")).alias("token_h"))
    )
    counts = toks.groupBy("token_h").agg(
        F.sum(F.col("_pos").cast("double")).alias("_cp"),
        F.sum((~F.col("_pos")).cast("double")).alias("_cn"),
    )
    totals = counts.agg(
        F.sum("_cp").alias("_tp"),
        F.sum("_cn").alias("_tn"),
        F.count(F.lit(1)).cast("double").alias("_v"),
    )

    def logp(c: Column, t: Column) -> Column:
        return F.log(
            (c + F.lit(alpha)) / (t + F.lit(alpha) * (F.col("_v") + 1))
        )

    w = F.round(
        (logp(F.col("_cp"), F.col("_tp")) - logp(F.col("_cn"), F.col("_tn")))
        * SCORE_SCALE,
        0,
    ).cast("long")
    vocab = counts.join(F.broadcast(totals)).select(
        "token_h", w.alias("w_milli")
    )
    oov = totals.select(
        F.lit(None).cast("long").alias("token_h"),
        F.round(
            (
                logp(F.lit(0.0), F.col("_tp"))
                - logp(F.lit(0.0), F.col("_tn"))
            )
            * SCORE_SCALE,
            0,
        ).cast("long").alias("w_milli"),
    )
    return vocab.unionByName(oov)


def classifier_scores(
    df: DataFrame,
    weights: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_milli: int = 0,
) -> DataFrame:
    """Score every document under a ``(token_h, w_milli)`` weight
    table: ``score_milli = sum(w_milli of each token occurrence)``
    (an exact integer sum — occurrence counts weight tokens naturally,
    as in a linear bag-of-words model) and ``keep = score > threshold``.
    Unknown tokens take the table's reserved NULL-key OOV weight.
    Zero-token docs score NULL and ``keep`` NULL (nothing measured —
    route them to the length filters, matching lm.perplexity_scores).

    Plan shape: the weight table broadcasts (vocabulary-sized); the
    corpus explodes to (id, token_h) — 8-byte keys, never strings —
    and one groupBy(id) finishes.  No global sort, no driver loop.
    """
    vocab = weights.filter(F.col("token_h").isNotNull())
    oov = weights.filter(F.col("token_h").isNull()).select(
        F.col("w_milli").alias("_oov_w")
    )
    toks = df.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("_w")
    ).select(id_col, portable_hash60(F.col("_w")).alias("token_h"))
    scored = (
        toks.join(F.broadcast(vocab), "token_h", "left")
        .join(F.broadcast(oov))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce("w_milli", "_oov_w")).alias("score_milli"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            "score_milli",
            (F.col("score_milli") > F.lit(int(threshold_milli))).alias(
                "keep"
            ),
        )
    )


def topk_per_group(
    df: DataFrame,
    k: int,
    *,
    group_col: str = "source",
    score_col: str = "score_milli",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact top-``k`` rows per group by ``(score DESC, id ASC)`` —
    the fineweb-edu selection step ("keep the k best-scored docs per
    dump/domain") — without ever sorting a whole group through one
    task.

    Two phases:
    1. A per-(group, score) HISTOGRAM (bounded, map-side combinable)
       with a cumulative window ordered by score DESC yields each
       group's threshold ``t`` = the k-th highest score; groups with
       fewer than k rows get ``t = NULL`` (keep all).
    2. Only rows with ``score >= t`` — at most k plus the ties AT t —
       reach the exact ``row_number`` window, so the per-group sort is
       O(k + ties), not O(group).

    Degenerate bound: a group whose scores are all EQUAL makes phase 2
    that whole group (every row ties at the threshold) — the same
    documented worst case as a degenerate LSH bucket.  Real
    milli-scaled quality scores are near-continuous, so ties are thin.

    NULL scores never rank (zero-token docs have nothing to rank on);
    NULL groups have no distribution to rank against and are excluded
    — both documented pass-outs, matching lm.ccnet_buckets.  The
    result is a pure function of the (group, score, id) multiset —
    partitioning- and engine-independent.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ranked_in = df.filter(
        F.col(score_col).isNotNull() & F.col(group_col).isNotNull()
    )
    hist = ranked_in.groupBy(group_col, score_col).agg(
        F.count(F.lit(1)).alias("_n")
    )
    cum = F.sum("_n").over(
        W.partitionBy(group_col).orderBy(F.col(score_col).desc())
    )
    thr = (
        hist.select(group_col, score_col, cum.alias("_cum"))
        .groupBy(group_col)
        .agg(
            F.max(
                F.when(F.col("_cum") >= k, F.col(score_col))
            ).alias("_t")
        )
    )
    survivors = ranked_in.join(F.broadcast(thr), group_col, "left").filter(
        F.col("_t").isNull() | (F.col(score_col) >= F.col("_t"))
    )
    rn = F.row_number().over(
        W.partitionBy(group_col).orderBy(
            F.col(score_col).desc(), F.col(id_col).asc()
        )
    )
    return (
        survivors.withColumn("_rn", rn)
        .filter(F.col("_rn") <= k)
        .drop("_t", "_rn")
    )
