"""Deduplication: exact, n-gram Jaccard, MinHash+LSH, SimHash.

All hashing is PORTABLE (md5-hex prefix → bigint) so the DuckDB oracle
can recompute identical signatures — the correctness gate covers the
whole near-dup pipeline, not just counts.

Scale design:
- shingling is explode() over built-in `transform(sequence(...))` —
  no Python, linear in corpus size;
- MinHash signatures: one groupBy(doc) over exploded shingle hashes
  with k min() aggregates (map-side combine collapses per-partition);
- LSH banding: signatures → band keys → self-join per band (the only
  shuffle that can fan out; band width controls candidate volume);
- exact Jaccard verification only on candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

# (a, b) pairs for the k minhash permutations h_j(x) = (a_j*x + b_j) % P
MINHASH_P = 4294967291
HASH_MOD = 2147483647  # shingle hash reduced below 2^31 so a*h fits in int64
MINHASH_COEFFS: list[tuple[int, int]] = [
    ((j * 2654435761 + 104729) % 1048573 + 1, (j * 97 + 12289) % 1048573)
    for j in range(16)
]
LSH_BANDS = 4  # 4 bands x 4 rows over the 16 signatures
SIMHASH_BITS = 32


def portable_hash60(col: Column) -> Column:
    """Deterministic 60-bit hash from the md5 hex prefix — identical in
    Spark (`conv`) and DuckDB (`try_cast('0x...')`)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def portable_hash60_sql(expr: str) -> str:
    """DuckDB rendering of :func:`portable_hash60`."""
    return f"try_cast(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def normalize_text(col: Column) -> Column:
    """lowercase + collapse whitespace — the canonical form hashed by
    every dedup variant."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup by normalized-text hash; keeps the smallest id.
    One shuffle on the 60-bit hash (not the full text — cheaper keys at
    100 TB; md5-prefix collisions are ~2^-30 per pair and acceptable
    for training-data dedup)."""
    h = portable_hash60(normalize_text(F.col(text_col)))
    w = W.partitionBy(h).orderBy(id_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _gram_index(words: Column, n: int) -> Column:
    """0..(n_words-n) when the doc has at least n words, else an EMPTY
    array.  The previous greatest(size-n, -1) form produced
    sequence(0,-1) == [0,-1] for short docs, and slice(words, 0, n)
    then crashed the job (INVALID_PARAMETER_VALUE.START) — a latent
    job-killer on any real corpus containing docs shorter than the
    shingle width."""
    return F.when(
        F.size(words) >= n, F.sequence(F.lit(0), F.size(words) - n)
    ).otherwise(F.array().cast("array<int>"))


def shingles(
    df: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Word n-gram shingles, exploded: (id cols..., shingle).

    `transform(sequence(...))` builds the n-grams JVM-side; explode
    fans out.  Empty/short docs produce zero shingles.
    """
    words = F.split(normalize_text(F.col(text_col)), " ")
    grams = F.transform(
        _gram_index(words, n),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    return df.withColumn("shingle", F.explode(grams)).drop(text_col)


def shingle_hash_array(text_col: str = "text", n: int = 3) -> Column:
    """Per-doc ARRAY of shingle hashes (mod 2^31-1) as one Column.

    Building block for map-only (zero-shuffle) signature variants via
    higher-order folds (F.aggregate/zip_with).  Measured on this host:
    the HOF folds run interpreted (CodegenFallback) and cost MORE cpu
    than the codegen'd explode+groupBy path (minhash 4.9 s vs 3.6 s,
    simhash 6.4 s vs 5.9 s at sf0.1), so the shipped minhash/simhash
    keep the one-shuffle groupBy plan; this array form remains the
    right choice when shuffle capacity — not cpu — is the binding
    constraint."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    grams = F.transform(
        _gram_index(words, n),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    return F.transform(grams, lambda g: portable_hash60(g) % HASH_MOD)


def shingle_hashes(
    df: DataFrame, text_col: str = "text", n: int = 3,
    portable: bool = True,
) -> DataFrame:
    """(doc, shingle_hash) rows — the raw MULTISET, one row per gram
    occurrence, hash reduced mod 2^31-1 (so minhash multiplies stay in
    int64).  Callers needing set semantics dedupe themselves: minhash's
    min() is duplicate-insensitive, simhash/jaccard apply .distinct(),
    decontaminate counts distinct.

    ``portable=True`` (default) uses the md5-prefix hash the DuckDB
    oracle can recompute; ``portable=False`` swaps in xxhash64 —
    measured ~18% faster end-to-end on minhash signatures (3.22 →
    2.64 s at sf0.1) and the right production setting when no
    cross-engine replay is needed."""
    sh = shingles(df, text_col, n)
    h = (
        portable_hash60(F.col("shingle")) % HASH_MOD
        if portable
        else F.pmod(F.xxhash64("shingle"), F.lit(HASH_MOD))
    )
    return sh.withColumn("h", h).drop("shingle")


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3,
    portable: bool = True,
) -> DataFrame:
    """k=16 minhash signatures per doc: groupBy(doc).agg(min(perm_j(h))).

    No pre-distinct: min() over the shingle multiset equals min() over
    the set, so the dedup shuffle the set semantics would need is pure
    waste — one shuffle total."""
    hashed = shingle_hashes(df, text_col, n, portable).select(id_col, "h")
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P).alias(f"mh{j}")
        for j, (a, b) in enumerate(MINHASH_COEFFS)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


#: Default per-band bucket cap for lsh_candidates.  A degenerate band
#: key (thousands of identical or empty docs) makes the per-band
#: self-join O(bucket²); buckets wider than this are skipped rather
#: than joined.  Docs in a skipped bucket still pair up through their
#: other (non-degenerate) bands, and true mass-duplicates are the
#: exact-dedup operator's job, not LSH's.
LSH_MAX_BUCKET = 1000


def _banded(sigs: DataFrame, id_col: str) -> DataFrame:
    """(id, band_key) rows — one per doc per band.

    ONE projection building all band keys + explode, NOT a union of
    per-band selects: Catalyst does not share common subtrees across
    union branches, so the union form recomputed the entire signature
    pipeline (shingles + md5 + 16 min-aggs) once PER BAND — 4× the
    work at any scale."""
    k = len(MINHASH_COEFFS)
    rows_per_band = k // LSH_BANDS
    keys = [
        F.concat_ws(
            "_",
            F.lit(str(b)),
            *[
                F.col(f"mh{j}")
                for j in range(b * rows_per_band, (b + 1) * rows_per_band)
            ],
        )
        for b in range(LSH_BANDS)
    ]
    return sigs.select(
        F.col(id_col), F.explode(F.array(*keys)).alias("band_key")
    )


def lsh_bucket_stats(
    sigs: DataFrame, id_col: str = "doc_id", max_bucket: int = LSH_MAX_BUCKET
) -> DataFrame:
    """Observability companion to :func:`lsh_candidates` — no silent
    caps: (n_buckets, n_oversized, rows_in_oversized) so a pipeline can
    report exactly how much the bucket cap dropped."""
    per_bucket = _banded(sigs, id_col).groupBy("band_key").agg(
        F.count(F.lit(1)).alias("n")
    )
    over = F.col("n") > max_bucket
    return per_bucket.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(over.cast("long")).alias("n_oversized"),
        F.sum(F.when(over, F.col("n")).otherwise(0)).alias("rows_in_oversized"),
    )


def lsh_candidates(
    sigs: DataFrame,
    id_col: str = "doc_id",
    max_bucket: int | None = LSH_MAX_BUCKET,
) -> DataFrame:
    """Candidate pairs sharing at least one LSH band (4 bands × 4 rows).

    Band key = concat of the band's 4 signatures; self-join per band,
    dedup across bands.  Output (id_a, id_b) with id_a < id_b.

    Buckets wider than ``max_bucket`` are excluded from the self-join
    (O(bucket²) guard for degenerate keys at 100 TB); use
    :func:`lsh_bucket_stats` to report what a cap dropped — pass
    ``max_bucket=None`` to disable.  The bucket-width count is a window
    over the same band_key partitioning the self-join shuffles on, so
    the exchange is shared — the cap adds no extra shuffle.
    """
    all_bands = _banded(sigs, id_col)
    if max_bucket is not None:
        w = W.partitionBy("band_key")
        all_bands = (
            all_bands.withColumn("_bn", F.count(F.lit(1)).over(w))
            .filter(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
    a = all_bands.alias("a")
    b_ = all_bands.alias("b")
    pairs = (
        a.join(b_, "band_key")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    return pairs


def jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame | None = None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.0,
    max_shingle_df: int | None = None,
    portable: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard for pairs.

    With ``candidates`` (from LSH) the restriction is pushed BELOW the
    pair-generation join — the scale path: the shingle table is first
    semi-joined to candidate doc ids (so only candidate docs' shingles
    shuffle), and collision rows are semi-joined to candidate pairs
    BEFORE the groupBy (so the O(collisions²) intersection work is
    bounded by what LSH admitted, not the whole corpus).  Without
    candidates, all pairs sharing >= 1 shingle are scored (quadratic in
    shingle-collision volume — small corpora / testing only).

    ``max_shingle_df`` drops shingles appearing in more than that many
    candidate docs BEFORE the intersection join.  This is the second
    quadratic guard after the LSH bucket cap: on templated text (log
    lines, boilerplate) a stop-phrase shingle shared by K candidate
    docs contributes K² collision rows — measured on the 600k-turn
    transcript corpus, the un-capped join spilled >78 GB of shuffle.
    Dropping a shingle from BOTH docs' sets changes their jaccard
    slightly (it removes a shared element), so the default is None
    (exact semantics, matches the DuckDB oracles); set it for corpora
    with heavy boilerplate.
    """
    sh = shingle_hashes(df, text_col, n, portable).select(id_col, "h").distinct()
    if max_shingle_df is not None:
        wdf = W.partitionBy("h")
        sh = (
            sh.withColumn("_df", F.count(F.lit(1)).over(wdf))
            .filter(F.col("_df") <= max_shingle_df)
            .drop("_df")
        )
    if candidates is not None:
        cand_ids = (
            candidates.select(F.col("id_a").alias(id_col))
            .unionByName(candidates.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        sh = sh.join(cand_ids, id_col, "left_semi")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("id_a"), "h")
    b = sh.select(F.col(id_col).alias("id_b"), "h")
    colliding = a.join(b, "h").filter(F.col("id_a") < F.col("id_b"))
    if candidates is not None:
        colliding = colliding.join(candidates, ["id_a", "id_b"], "left_semi")
    inter = colliding.groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).alias("inter")
    )
    out = (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ),
        )
        .select("id_a", "id_b", "jaccard")
    )
    if threshold > 0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3,
    portable: bool = True,
) -> DataFrame:
    """SimHash fingerprint (32 bits) per doc: per-bit majority vote over
    the doc's DISTINCT shingle hashes.

    Shape: distinct (doc, h) pairs, then ONE groupBy(doc) with 32
    conditional ±1 sums — bit b is set when the vote sum is positive.
    No row multiplication (the previous form exploded sequence(0,31),
    32× rows), no Python, and every expression stays inside
    whole-stage codegen.  Two exchanges, but the second moves only 32
    partial sums per (doc × upstream partition) — negligible after
    map-side combine; the collect_set one-exchange variant was
    MEASURED ~11% slower end-to-end because its 32 per-bit array
    scans run interpreted (higher-order functions are CodegenFallback)."""
    hashed = shingle_hashes(df, text_col, n, portable).select(id_col, "h").distinct()

    def bit_is_set(b: int):
        return F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1

    votes = hashed.groupBy(id_col).agg(
        *[
            F.sum(F.when(bit_is_set(b), 1).otherwise(-1)).alias(f"_v{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    fingerprint = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        fingerprint = fingerprint + F.when(
            F.col(f"_v{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return votes.select(id_col, fingerprint.alias("simhash"))


def hamming_distance(a: Column, b: Column) -> Column:
    """bit_count(a XOR b) — near-dup test over simhash fingerprints."""
    return F.bit_count(a.bitwiseXOR(b))


def dedup_lines_global(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-GLOBAL line dedup (the C4-style pass): every distinct
    non-empty line survives exactly once across the whole corpus — its
    first occurrence in (id, line position) order — and each document
    is reassembled from its surviving lines in original order.
    Documents whose lines were all claimed elsewhere come back with
    empty text.  EMPTY lines are kept verbatim (they are formatting,
    not content, and deduping them would make the op non-idempotent:
    an emptied doc's '' text re-enters as a '' line on a second pass
    and would steal genuine blank lines from higher-id docs).

    Scale shape: posexplode (narrow) → first-wins via
    groupBy(line).min(struct(id, pos)) — NOT a row_number window: the
    min(struct) aggregate combines map-side, so a boilerplate line
    duplicated millions of times (blank-ish headers, banners) reduces
    per-partition instead of routing every occurrence to one reducer
    for a full sort — → one shuffle back on the doc id to reassemble
    (sort_array over (pos, line) structs keeps original order without
    a per-doc sort pass).  No Python anywhere.

    ``sep`` is a Java regex (it feeds ``F.split``) and is also used
    literally when reassembling — keep it to fixed single characters
    like the default newline."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("_pos", "_line"),
    )
    winners = (
        lines.filter(F.col("_line") != "")
        .groupBy("_line")
        .agg(F.min(F.struct(id_col, "_pos")).alias("_w"))
        .select(
            F.col(f"_w.{id_col}").alias(id_col),
            F.col("_w._pos").alias("_pos"),
            "_line",
        )
    )
    kept = winners.unionByName(
        lines.filter(F.col("_line") == "").select(id_col, "_pos", "_line")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("_pos", "_line"))
                ),
                lambda s: s["_line"],
            ),
        ).alias(text_col)
    )
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left")
        .fillna({text_col: ""})
    )


def build_dedup_index(
    corpus: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    portable: bool = True,
    cache: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Reusable per-corpus dedup index:
    ``(exact_index, band_index, shingle_index)``.

    - ``exact_index``: (corpus_id, text_h) — 60-bit normalized-text hash;
    - ``band_index``: (corpus_id, band_key) — minhash LSH band keys;
    - ``shingle_index``: (corpus_id, h) — DISTINCT shingle hashes, the
      rescore side of the jaccard check.

    The 100 TB ingest pattern: the index is computed ONCE over the
    corpus and persisted (Iceberg/parquet, bucketed by text_h /
    band_key / corpus_id so snapshot joins are co-located); every new
    snapshot is deduped against the index tables — the corpus TEXT is
    never re-read or re-shuffled per ingest (the shingle index is what
    makes the jaccard rescore corpus-scan-free).  After accepting a
    snapshot, append its own index rows to keep the index current.
    """
    exact = corpus.select(
        F.col(id_col).alias("corpus_id"),
        portable_hash60(normalize_text(F.col(text_col))).alias("text_h"),
    )
    # ONE shingle pass feeds both the signature aggregation and the
    # shingle index (min over the distinct set == min over the
    # multiset, so sharing the distinct stream is exact);
    # ``cache=True`` persists it so building bands does not re-shingle
    # the corpus — ContextCleaner reclaims it with the index frames
    sh = (
        shingle_hashes(corpus, text_col, n, portable)
        .select(F.col(id_col).alias("corpus_id"), "h")
        .distinct()
    )
    if cache:
        sh = sh.persist()
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P).alias(f"mh{j}")
        for j, (a, b) in enumerate(MINHASH_COEFFS)
    ]
    sigs = sh.groupBy("corpus_id").agg(*aggs)
    bands = _banded(sigs, "corpus_id").select("corpus_id", "band_key")
    return exact, bands, sh


def cross_jaccard(
    new_df: DataFrame,
    corpus_df: DataFrame | None,
    candidates: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    portable: bool = True,
    corpus_shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard for CROSS-SET candidate pairs
    (new_id, corpus_id) — the rescore stage of incremental dedup.

    Both shingle streams are semi-joined to their candidate id set
    BEFORE the intersection join, so the rescore cost is bounded by
    what LSH admitted — never snapshot × corpus.  Pass
    ``corpus_shingles`` (the (corpus_id, h) shingle index from
    :func:`build_dedup_index`) to skip re-shingling the corpus
    entirely; without it the corpus text is re-read, pruned to
    candidate docs by the semi-join."""
    new_ids = candidates.select("new_id").distinct()
    corp_ids = candidates.select("corpus_id").distinct()
    new_sh = (
        shingle_hashes(new_df, text_col, n, portable)
        .select(F.col(id_col).alias("new_id"), "h")
        .distinct()
        .join(new_ids, "new_id", "left_semi")
    )
    if corpus_shingles is not None:
        corp_sh = corpus_shingles.join(corp_ids, "corpus_id", "left_semi")
    elif corpus_df is not None:
        corp_sh = (
            shingle_hashes(corpus_df, text_col, n, portable)
            .select(F.col(id_col).alias("corpus_id"), "h")
            .distinct()
            .join(corp_ids, "corpus_id", "left_semi")
        )
    else:
        raise ValueError("need corpus_df or corpus_shingles")
    sz_new = new_sh.groupBy("new_id").agg(F.count(F.lit(1)).alias("sz_n"))
    sz_corp = corp_sh.groupBy("corpus_id").agg(F.count(F.lit(1)).alias("sz_c"))
    inter = (
        new_sh.join(corp_sh, "h")
        .join(candidates, ["new_id", "corpus_id"], "left_semi")
        .groupBy("new_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sz_new, "new_id")
        .join(sz_corp, "corpus_id")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_n") + F.col("sz_c") - F.col("inter")),
                6,
            ),
        )
        .select("new_id", "corpus_id", "jaccard")
    )


def dedup_incremental(
    new_df: DataFrame,
    corpus_df: DataFrame | None = None,
    *,
    index: tuple[DataFrame, ...] | None = None,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_bucket: int | None = LSH_MAX_BUCKET,
    portable: bool = True,
    cache: bool = True,
) -> DataFrame:
    """Incremental snapshot-ingest dedup: the subset of ``new_df`` that
    is neither an exact nor a near (jaccard ≥ ``threshold``) duplicate
    of anything already in the corpus.

    Phase 1 — exact: anti-join the snapshot's 60-bit normalized-text
    hash against the corpus exact index (only the 8-byte hash column
    of the corpus moves, never its text).
    Phase 2 — near: minhash-band the phase-1 survivors, join their
    band keys to the corpus band index (bucket-capped like
    :func:`lsh_candidates`), rescore candidates with exact cross-set
    jaccard, and drop snapshot docs at/above the threshold.

    Intra-snapshot duplicates are deliberately NOT removed here — that
    is the corpus-wide :func:`lsh_candidates`/:func:`jaccard_pairs`
    pass's job; this operator answers "is it already in the corpus?".
    Pass a persisted 3-table ``index`` (from :func:`build_dedup_index`)
    and omit ``corpus_df`` to run a snapshot ingest with ZERO corpus
    reads — the incremental point; a legacy 2-table (exact, bands)
    index still works but re-reads candidate corpus docs for the
    rescore."""
    if index is None:
        if corpus_df is None:
            raise ValueError("need corpus_df or index")
        index = build_dedup_index(
            corpus_df, text_col=text_col, id_col=id_col, n=n, portable=portable
        )
    if len(index) == 3:
        exact_idx, band_idx, shingle_idx = index
    else:
        (exact_idx, band_idx), shingle_idx = index, None
    if shingle_idx is None and corpus_df is None:
        raise ValueError(
            "a 2-table index needs corpus_df for the jaccard rescore"
        )
    th = portable_hash60(normalize_text(F.col(text_col)))
    survivors = (
        new_df.withColumn("_th", th)
        .join(
            exact_idx.select(F.col("text_h").alias("_th")).distinct(),
            "_th",
            "left_anti",
        )
        .drop("_th")
    )
    if cache:
        # the survivors subtree (snapshot parse + normalize + md5 +
        # exact anti-join) feeds the band join, the jaccard rescore,
        # and the final anti-join — Catalyst does not share common
        # subtrees across plan branches (see _banded), so without a
        # persist one ingest recomputes it ~5×.  Spark's ContextCleaner
        # reclaims the cache once the result frame is unreachable;
        # pass cache=False for pure-lazy plans (plan gates, oracles).
        survivors = survivors.persist()
    sigs = minhash_signatures(survivors, text_col, id_col, n, portable)
    new_bands = _banded(sigs, id_col).select(
        F.col(id_col).alias("new_id"), "band_key"
    )
    if max_bucket is not None:
        # cap BOTH sides of the band join: a degenerate corpus bucket
        # AND a mass-duplicate ingest batch (thousands of near-identical
        # snapshot docs sharing every band key) are each O(bucket²)
        w = W.partitionBy("band_key")
        band_idx = (
            band_idx.withColumn("_bn", F.count(F.lit(1)).over(w))
            .filter(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
        new_bands = (
            new_bands.withColumn("_bn", F.count(F.lit(1)).over(w))
            .filter(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
    cand = (
        new_bands.join(band_idx, "band_key")
        .select("new_id", "corpus_id")
        .distinct()
    )
    if cache:
        cand = cand.persist()  # consumed 3× inside cross_jaccard
    scored = cross_jaccard(
        survivors, corpus_df, cand,
        text_col=text_col, id_col=id_col, n=n, portable=portable,
        corpus_shingles=shingle_idx,
    )
    kill = (
        scored.filter(F.col("jaccard") >= threshold)
        .select(F.col("new_id").alias(id_col))
        .distinct()
    )
    return survivors.join(kill, id_col, "left_anti")


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing ≥
    ``min_overlap`` distinct word ``n``-grams with ANY benchmark doc
    (the GPT-3-style 13-gram rule).

    Scale shape: the benchmark's distinct shingle-hash set is tiny
    (eval suites are ~10⁴-10⁶ grams) → broadcast semi-join against the
    corpus shingle stream, then one groupBy(doc) count.  The corpus —
    the 100 TB side — is never shuffled on text, only its matching
    shingle rows reach the aggregation.

    Returns (id, n_contaminated_grams) for flagged docs only; anti-join
    the result against the corpus to drop them."""
    corp = shingle_hashes(corpus, text_col, n).select(id_col, "h")
    bench = shingle_hashes(benchmark, text_col, n).select("h").distinct()
    # broadcast semi-join BEFORE any corpus-side distinct: the narrow
    # filter drops everything but matching grams, so the only shuffle
    # (the per-doc distinct count) moves matches, not the corpus
    hits = corp.join(F.broadcast(bench), "h", "left_semi")
    return (
        hits.groupBy(id_col)
        .agg(F.count_distinct("h").alias("n_contaminated_grams"))
        .filter(F.col("n_contaminated_grams") >= min_overlap)
    )


def connected_components(
    pairs: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Duplicate-cluster formation: connected components over a
    near-dup pair list — the step real training-data pipelines run
    AFTER pair generation (a pair list alone over-deletes: kill-higher-
    id of each pair is not transitive, so A~B, B~C can delete both B
    and C even though keeping one of them is enough; clustering keeps
    exactly one representative per duplicate GROUP).

    Algorithm: iterative min-label propagation.  Each node starts
    labeled with its own id; every round each node takes the min of its
    own label and its neighbors' labels; at the fixed point every edge
    has equal labels on both ends, so each component is uniformly
    labeled with its minimum member id.  Rounds needed = graph
    diameter, and near-dup graphs are band-collision cliques (diameter
    1-3 in practice), so 3-4 distributed rounds close real corpora.
    For adversarially chain-shaped graphs the published escalation is
    alternating large-star/small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14) at O(log n) rounds —
    not needed for dedup workloads.

    Scale shape per round: one shuffle of the symmetrized edge list
    joined to the (node, label) table + one groupBy(node) min — both
    keyed on node id, no quadratic term.  ``localCheckpoint`` cuts the
    growing lineage each round (iterative plans otherwise re-derive
    every prior round at each action).

    Returns (id, cluster_id) for every node that appears in ``pairs``
    (singleton docs never enter the pair list; their cluster is
    themselves by definition).  Raises after ``max_iter`` rounds
    without convergence rather than returning a partial clustering.
    """
    edges = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("cluster_id", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(
                    F.col("id").alias("v"), F.col("cluster_id").alias("_vc")
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("_vc").alias("_nc"))
            .select(F.col("u").alias("id"), "_nc")
        )
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("cluster_id"), F.coalesce("_nc", "cluster_id")
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "pathologically chain-shaped graph; raise max_iter or switch to "
        "an alternating-star formulation"
    )


def dup_clusters(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    n: int = 3,
    max_bucket: int | None = LSH_MAX_BUCKET,
    max_shingle_df: int | None = None,
    portable: bool = True,
) -> DataFrame:
    """End-to-end duplicate-group extraction: minhash → LSH candidates
    → exact-jaccard rescore at ``threshold`` → connected components.
    Returns (id, cluster_id); keep `cluster_id == id` rows (plus all
    docs absent from the result) for a one-representative-per-group
    dedup.  ``max_bucket``/``max_shingle_df`` are the two quadratic
    guards, passed through to the candidate and rescore stages."""
    sigs = minhash_signatures(df, text_col, id_col, n, portable)
    cand = lsh_candidates(sigs, id_col, max_bucket=max_bucket)
    pairs = jaccard_pairs(
        df, cand, text_col=text_col, id_col=id_col, n=n,
        threshold=threshold, max_shingle_df=max_shingle_df,
        portable=portable,
    )
    return connected_components(pairs).withColumnRenamed("id", id_col)
