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
    # Enforce the nb_logodds_weights contract lazily, inside the plan:
    # a weights frame with NO NULL-key OOV row would make the cross
    # join empty (every doc silently scores NULL), and one with
    # several would duplicate every token row.  Aggregating the OOV
    # side to exactly one row and raising on a bad count turns both
    # malformations into a loud error instead.
    oov = weights.filter(F.col("token_h").isNull()).agg(
        F.count(F.lit(1)).alias("_n_oov"),
        F.min("w_milli").alias("_oov_w"),
    )
    checked_oov = F.when(F.col("_n_oov") == 1, F.col("_oov_w")).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "classifier_scores: weights frame must carry exactly"
                    " one token_h IS NULL OOV row, got "
                ),
                F.col("_n_oov").cast("string"),
            )
        )
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
            F.sum(F.coalesce(F.col("w_milli"), checked_oov)).alias(
                "score_milli"
            ),
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
    bucket_width: int = 1000,
) -> DataFrame:
    """Exact top-``k`` rows per group by ``(score DESC, id ASC)`` —
    the fineweb-edu selection step ("keep the k best-scored docs per
    dump/domain") — without ever sorting a whole group through one
    task.

    Three phases:
    1. A per-(group, floor(score / bucket_width)) COARSE histogram
       with a cumulative window ordered by bucket DESC locates, for
       each group, the bucket ``b*`` that contains the k-th highest
       score, plus the exact count of rows in strictly higher buckets.
       The window's per-group cardinality is O(score range /
       bucket_width), independent of how many distinct raw scores a
       hot group has (the round-3 claim of "bounded" held only for
       genuinely low-cardinality scores like ccnet's rounded means;
       raw milli sums are near-unique, so the coarse pass is what
       actually bounds the funnel).
    2. Only rows falling IN ``b*`` build an exact per-(group, score)
       histogram; its cumulative window (seeded with the higher-bucket
       count) yields the exact threshold ``t`` = the k-th highest
       score.  Per-group cardinality: O(distinct scores in one
       bucket).  Groups with fewer than k rows get ``t = NULL``
       (keep all).
    3. Only rows with ``score >= t`` — at most k plus the ties AT t —
       reach the exact ``row_number`` window, so the per-group sort is
       O(k + ties), not O(group).

    Degenerate bound: a group whose scores are all EQUAL makes phase 3
    that whole group (every row ties at the threshold) — the same
    documented worst case as a degenerate LSH bucket.  Real
    milli-scaled quality scores are near-continuous, so ties are thin.

    NULL scores never rank (zero-token docs have nothing to rank on);
    NULL groups have no distribution to rank against and are excluded
    — both documented pass-outs, matching lm.ccnet_buckets.  The
    result is a pure function of the (group, score, id) multiset —
    partitioning-, bucket_width- and engine-independent (the coarse
    pass only changes WHERE the exact threshold is computed, never its
    value — doc_topk_per_source's full-row hash gate pins this).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")
    ranked_in = df.filter(
        F.col(score_col).isNotNull() & F.col(group_col).isNotNull()
    )
    bucket = F.floor(F.col(score_col) / F.lit(int(bucket_width)))
    coarse = ranked_in.groupBy(group_col, bucket.alias("_b")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    bcum = F.sum("_n").over(
        W.partitionBy(group_col).orderBy(F.col("_b").desc())
    )
    # max-of-struct picks the HIGHEST bucket whose cumulative count
    # reaches k (struct ordering is lexicographic on the first field),
    # carrying the exact number of rows strictly above it
    bstar = (
        coarse.select(group_col, "_b", "_n", bcum.alias("_bcum"))
        .groupBy(group_col)
        .agg(
            F.max(
                F.when(
                    F.col("_bcum") >= k,
                    F.struct(
                        F.col("_b").alias("_b"),
                        (F.col("_bcum") - F.col("_n")).alias("_above"),
                    ),
                )
            ).alias("_bs")
        )
        .select(
            group_col,
            F.col("_bs._b").alias("_bstar"),
            F.col("_bs._above").alias("_above"),
        )
    )
    in_bucket = (
        ranked_in.join(F.broadcast(bstar), group_col)
        .filter(bucket == F.col("_bstar"))
        .groupBy(group_col, score_col, "_above")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    cum = F.col("_above") + F.sum("_n").over(
        W.partitionBy(group_col).orderBy(F.col(score_col).desc())
    )
    thr = (
        in_bucket.select(group_col, score_col, cum.alias("_cum"))
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


def nb_multiclass_weights(
    labeled: DataFrame,
    *,
    label_col: str = "label",
    text_col: str = "text",
    alpha: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """K-class generalization of :func:`nb_logodds_weights` — the
    fineweb-edu-style ordinal grader (integer grades 0..K-1, argmax of
    per-class Naive-Bayes log-posteriors), closed form: per-class token
    counts + per-class doc priors, no iterative optimizer.

    Returns ``(weights, classes)``:
    - ``weights``: DENSE ``(token_h, label, w_milli)`` — every vocab
      token carries a smoothed in-class log-prob for EVERY class
      (``w = ln((c + a) / (T_k + a * (V + 1)))``, c possibly 0), so a
      scoring join on token_h yields all K classes at once.  K x the
      binary table's size; still vocabulary-bounded and broadcastable.
    - ``classes``: ``(label, prior_milli, oov_milli)`` — per-class doc
      log-prior and OOV floor (the reserved ``+ 1`` vocab slot).

    NULL labels are ignored (the binary convention); zero-token seed
    docs contribute to priors but not to token counts.  All weights
    round to integer millis so scores are exact cross-engine sums.
    """
    seed = labeled.filter(F.col(label_col).isNotNull()).select(
        F.col(label_col).cast("int").alias("label"), F.col(text_col)
    )
    stoks = seed.select(
        "label", F.explode(_tokens(text_col)).alias("_w")
    ).select("label", portable_hash60(F.col("_w")).alias("token_h"))
    counts = stoks.groupBy("token_h", "label").agg(
        F.count(F.lit(1)).cast("double").alias("_c")
    )
    klass = (
        seed.groupBy("label")
        .agg(F.count(F.lit(1)).cast("double").alias("_nd"))
        .join(
            stoks.groupBy("label").agg(
                F.count(F.lit(1)).cast("double").alias("_tk")
            ),
            "label",
        )
    )
    totals = klass.agg(F.sum("_nd").alias("_n")).crossJoin(
        counts.select("token_h").distinct().agg(
            F.count(F.lit(1)).cast("double").alias("_v")
        )
    )
    klass = klass.crossJoin(F.broadcast(totals))

    def _milli(x: Column) -> Column:
        return F.round(x * SCORE_SCALE, 0).cast("long")

    denom = F.col("_tk") + F.lit(alpha) * (F.col("_v") + 1)
    classes = klass.select(
        "label",
        _milli(F.log(F.col("_nd") / F.col("_n"))).alias("prior_milli"),
        _milli(F.log(F.lit(alpha) / denom)).alias("oov_milli"),
    )
    vocab = counts.select("token_h").distinct()
    dense = (
        vocab.crossJoin(F.broadcast(klass))
        .join(counts, ["token_h", "label"], "left")
        .select(
            "token_h",
            "label",
            _milli(
                F.log(
                    (F.coalesce(F.col("_c"), F.lit(0.0)) + F.lit(alpha))
                    / denom
                )
            ).alias("w_milli"),
        )
    )
    return dense, classes


def grade_documents(
    df: DataFrame,
    weights: DataFrame,
    classes: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, grade, score_milli, n_tokens) — the argmax class per
    document under a :func:`nb_multiclass_weights` model:
    ``score(doc, k) = prior(k) + sum(w of in-vocab tokens)
    + n_oov * oov(k)``, exact integer millis; ties break by
    (score DESC, label ASC).  Zero-token docs are excluded (nothing
    measured — route them to the length filters, the lm.py
    convention).

    Plan: the dense weight table broadcasts; the corpus explodes to
    (id, token_h); because the table is dense over the vocabulary, one
    inner join + groupBy(id, label) yields every class's hit sum AND
    the per-class in-vocab count together.  Docs with zero vocab hits
    take a FALLBACK grade computed from the collected class constants
    (K bounded rows — the IVF-training-sample pattern) as a pure
    Column expression: ``argmax_k(prior_k + n_tokens * oov_k)`` —
    mathematically identical to scoring them through the join path,
    without an anti-join that would recompute the whole explode
    subtree a second time (measured in the plan: the round-4 rewrite
    removed one full tokenize+join+aggregate recomputation).  No
    corpus-side cross join by K."""
    kl = sorted(
        (int(r["label"]), int(r["prior_milli"]), int(r["oov_milli"]))
        for r in classes.select(
            "label", "prior_milli", "oov_milli"
        ).collect()
    )
    if not kl:
        raise ValueError(
            "grade_documents: classes frame is empty (no labeled seed "
            "docs with tokens)"
        )
    toks = df.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("_w")
    ).select(id_col, portable_hash60(F.col("_w")).alias("token_h"))
    n_tok = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tokens"))
    hits = (
        toks.join(F.broadcast(weights), "token_h")
        .groupBy(id_col, "label")
        .agg(
            F.sum("w_milli").alias("_s"),
            F.count(F.lit(1)).alias("_n_in"),
        )
    )
    scored = (
        hits.join(F.broadcast(classes), "label")
        .join(n_tok, id_col)
        .select(
            id_col,
            "label",
            (
                F.col("prior_milli")
                + F.col("_s")
                + (F.col("n_tokens") - F.col("_n_in")) * F.col("oov_milli")
            ).alias("score_milli"),
        )
    )
    best = scored.groupBy(id_col).agg(
        F.min(
            F.struct(
                (-F.col("score_milli")).alias("_neg"),
                F.col("label").alias("label"),
                F.col("score_milli").alias("score_milli"),
            )
        ).alias("_b")
    )
    # no-hit fallback: greatest-of-structs picks (max score, then min
    # label via the negated tiebreak) among prior_k + n * oov_k
    n = F.col("n_tokens").cast("long")
    fb = F.greatest(
        *[
            F.struct(
                (F.lit(prior) + n * F.lit(oov)).alias("_s"),
                F.lit(-label).alias("_nl"),
                F.lit(label).alias("label"),
            )
            for label, prior, oov in kl
        ]
    ) if len(kl) > 1 else F.struct(
        (F.lit(kl[0][1]) + n * F.lit(kl[0][2])).alias("_s"),
        F.lit(-kl[0][0]).alias("_nl"),
        F.lit(kl[0][0]).alias("label"),
    )
    return (
        n_tok.join(best, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("_b.label"), fb["label"]).alias("grade"),
            F.coalesce(F.col("_b.score_milli"), fb["_s"]).alias(
                "score_milli"
            ),
            "n_tokens",
        )
    )
