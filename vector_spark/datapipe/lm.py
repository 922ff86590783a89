"""CCNet-style statistical quality filtering: score documents by
cross-entropy under a unigram language model trained on a trusted
reference slice, then bucket each language into head/middle/tail by
score percentile (the CCNet recipe: keep the head, inspect the
middle, drop the tail).

Spark-first shapes:
- The LM is a (token-hash, logp) table built with one groupBy over the
  reference slice; tokens are reduced to the portable 60-bit hash
  BEFORE any shuffle, so vocabulary keys are 8 bytes, never strings.
- Scoring joins the exploded corpus tokens to the LM on the hash —
  a plain equi-join Catalyst broadcasts when the vocabulary is small
  and shuffles by key when it is not — then one groupBy(doc) for the
  per-doc mean negative log-likelihood.
- Percentile bucketing NEVER sorts a language through one task: the
  thresholds come from a per-(group, rounded-score) histogram — a
  bounded aggregate — with a cumulative window over that small frame,
  broadcast back as two thresholds per group.

Everything is engine-portable: smoothing is closed-form (ln of a
ratio), scores round to fixed integer millinats before any
comparison, and ties at a threshold all fall to the lower bucket —
the DuckDB oracle reproduces buckets exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from vector_spark.datapipe.dedup import normalize_text, portable_hash60

#: scores are compared as integer millinats (round(nll * 1000)) so a
#: last-ulp ln() divergence between engines cannot flip a bucket
SCORE_SCALE = 1000


def _tokens(text_col: str) -> Column:
    """Non-empty whitespace tokens of the normalized text (the empty
    string a blank doc splits to is NOT a token)."""
    return F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda t: t != ""
    )


def unigram_lm(
    ref_df: DataFrame, *, text_col: str = "text", alpha: float = 0.5
) -> DataFrame:
    """Additively-smoothed unigram LM from a reference corpus:
    ``logp(w) = ln((c_w + alpha) / (T + alpha * (V + 1)))`` with one
    reserved out-of-vocabulary type (the ``+ 1``), whose log-prob rides
    along as the single ``token_h IS NULL`` row — NULL never matches an
    equi-join key, so the sentinel is invisible to scoring joins and
    the frame stays self-contained (no side-channel constants to keep
    in sync with the scorer)."""
    toks = ref_df.select(
        F.explode(_tokens(text_col)).alias("_w")
    ).select(portable_hash60(F.col("_w")).alias("token_h"))
    counts = toks.groupBy("token_h").agg(F.count(F.lit(1)).alias("_c"))
    totals = counts.agg(
        F.sum("_c").alias("_t"), F.count(F.lit(1)).alias("_v")
    )
    denom = F.col("_t") + F.lit(alpha) * (F.col("_v") + 1)
    lm = counts.join(F.broadcast(totals)).select(
        "token_h", F.log((F.col("_c") + F.lit(alpha)) / denom).alias("logp")
    )
    oov = totals.select(
        F.lit(None).cast("long").alias("token_h"),
        F.log(F.lit(alpha) / denom).alias("logp"),
    )
    return lm.unionByName(oov)


def perplexity_scores(
    df: DataFrame,
    lm: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc mean negative log-likelihood under ``lm`` (a
    :func:`unigram_lm` frame), in integer millinats: (id, n_tokens,
    nll_milli).  Unknown tokens take the LM's reserved OOV mass; docs
    with zero tokens score NULL (nothing to measure — route them to
    the length filters instead)."""
    vocab = lm.filter(F.col("token_h").isNotNull())
    oov = lm.filter(F.col("token_h").isNull()).select(
        F.col("logp").alias("_oov_logp")
    )
    toks = df.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("_w")
    ).select(id_col, portable_hash60(F.col("_w")).alias("token_h"))
    scored = (
        toks.join(vocab, "token_h", "left")
        .join(F.broadcast(oov))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                -F.avg(F.coalesce("logp", "_oov_logp")) * SCORE_SCALE, 0
            ).cast("long").alias("nll_milli"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            "nll_milli",
        )
    )


def ccnet_buckets(
    scored: DataFrame,
    *,
    group_col: str = "lang",
    score_col: str = "nll_milli",
    fracs: tuple[float, float] = (1 / 3, 2 / 3),
) -> DataFrame:
    """head/middle/tail per group by score percentile: the first
    ``fracs[0]`` of each group's rows (lowest scores = most fluent)
    are ``head``, up to ``fracs[1]`` are ``middle``, the rest
    ``tail``.  Threshold ``t_k`` is the smallest score whose
    cumulative count reaches ``ceil(frac_k * group_total)``; ties at a
    threshold all take the lower bucket, so the result is a pure
    function of the (group, score) multiset — partitioning- and
    engine-independent.  NULL scores — and NULL groups, which have no
    percentile distribution to rank against — pass through with a
    NULL bucket rather than defaulting into ``tail``.

    The cumulative window runs over the per-(group, score) HISTOGRAM —
    bounded by distinct integer scores, not corpus rows — so no
    language ever sorts through a single task; the two thresholds per
    group broadcast back onto the corpus."""
    lo, hi = fracs
    if not (0 < lo <= hi <= 1):
        raise ValueError(f"fracs must satisfy 0 < lo <= hi <= 1, got {fracs}")
    hist = (
        scored.filter(
            F.col(score_col).isNotNull() & F.col(group_col).isNotNull()
        )
        .groupBy(group_col, score_col)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    win = W.partitionBy(group_col)
    cum = F.sum("_n").over(win.orderBy(score_col))
    tot = F.sum("_n").over(win)
    marked = hist.select(
        group_col,
        score_col,
        cum.alias("_cum"),
        tot.alias("_tot"),
    )
    thresholds = marked.groupBy(group_col).agg(
        F.min(
            F.when(F.col("_cum") >= F.ceil(F.lit(lo) * F.col("_tot")),
                   F.col(score_col))
        ).alias("_t1"),
        F.min(
            F.when(F.col("_cum") >= F.ceil(F.lit(hi) * F.col("_tot")),
                   F.col(score_col))
        ).alias("_t2"),
    )
    return (
        scored.join(F.broadcast(thresholds), group_col, "left")
        .withColumn(
            "bucket",
            F.when(
                F.col(score_col).isNull() | F.col(group_col).isNull(),
                F.lit(None).cast("string"),
            )
            .when(F.col(score_col) <= F.col("_t1"), F.lit("head"))
            .when(F.col(score_col) <= F.col("_t2"), F.lit("middle"))
            .otherwise(F.lit("tail")),
        )
        .drop("_t1", "_t2")
    )


def dsir_logratio(
    df: DataFrame,
    target_lm: DataFrame,
    raw_lm: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per-doc log importance
    ``log w(x) = sum_t [ log p_target(t) - log p_raw(t) ]`` under two
    :func:`unigram_lm` frames — rank-select the docs that look most
    like the target distribution relative to the raw corpus.

    Returns ``(id, n_tokens, logratio_milli)``.  Each token's log-prob
    DELTA rounds to integer millinats before the per-doc sum, so the
    sum is exact integer arithmetic and order-independent — the DuckDB
    oracle reproduces every rank comparison bit-for-bit.  Unknown
    tokens take each LM's reserved NULL-key OOV mass independently (a
    token can be in-vocab for one LM and OOV for the other).  Zero-
    token docs score NULL (nothing to weigh), matching
    :func:`perplexity_scores`.

    Plan shape: both LM frames broadcast (vocabulary-sized); the
    corpus explodes to 8-byte token hashes, two broadcast left joins,
    one groupBy(doc).  The 100 TB side never shuffles on strings.
    """

    def parts(lm: DataFrame, tag: str) -> tuple[DataFrame, DataFrame]:
        vocab = lm.filter(F.col("token_h").isNotNull()).select(
            "token_h", F.col("logp").alias(f"_lp_{tag}")
        )
        oov = lm.filter(F.col("token_h").isNull()).select(
            F.col("logp").alias(f"_oov_{tag}")
        )
        return vocab, oov

    tgt_v, tgt_o = parts(target_lm, "t")
    raw_v, raw_o = parts(raw_lm, "r")
    toks = df.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("_w")
    ).select(id_col, portable_hash60(F.col("_w")).alias("token_h"))
    delta_milli = F.round(
        (
            F.coalesce("_lp_t", "_oov_t") - F.coalesce("_lp_r", "_oov_r")
        )
        * SCORE_SCALE,
        0,
    ).cast("long")
    scored = (
        toks.join(F.broadcast(tgt_v), "token_h", "left")
        .join(F.broadcast(raw_v), "token_h", "left")
        .join(F.broadcast(tgt_o))
        .join(F.broadcast(raw_o))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(delta_milli).alias("logratio_milli"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            "logratio_milli",
        )
    )
