"""Text analysis: token counting, quality scoring, language ID,
document fingerprinting — all built-in expressions (portable to the
DuckDB oracle; zero Python in the hot path)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from vector_spark.datapipe.dedup import normalize_text, portable_hash60

#: tiny per-language stopword marker sets (n-gram heuristic langid)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "des", "est"],
    "zh": ["de", "shi", "le", "zai", "you"],
}

#: BPE-ish token pattern: word pieces, numbers, or single non-space symbols
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def normalize_unicode(col: Column, form: str = "NFKC") -> Column:
    """Unicode normalization (NFC/NFD/NFKC/NFKD) as an Arrow-batched
    pandas UDF — the canonicalization pass that runs BEFORE hashing in
    multilingual dedup (visually-identical strings with different
    codepoint sequences must hash identically).  Not part of the
    reference's VRL surface; a training-data preprocessing op."""
    import unicodedata

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @F.pandas_udf("string")
    def _norm(vals: pd.Series) -> pd.Series:
        return vals.map(
            lambda s: None if s is None else unicodedata.normalize(form, s)
        )

    return _norm(col)


def words(col: Column) -> Column:
    return F.split(normalize_text(col), " ")


def token_count(col: Column) -> Column:
    """Whitespace token count + a BPE-ish symbol-aware count."""
    return F.size(words(col))


def token_count_bpe(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_PATTERN), 0))


def quality_score(col: Column) -> Column:
    """Heuristic [0,1] quality: length band + punctuation ratio +
    mean word length band (the usual cheap pre-filters before model
    scoring)."""
    n_chars = F.length(col)
    n_words = token_count(col)
    mean_wlen = n_chars / F.greatest(n_words, F.lit(1))
    punct = F.size(F.regexp_extract_all(col, F.lit(r"[^\w\s]"), 0))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    len_ok = (n_chars >= 20) & (n_chars <= 20000)
    wlen_ok = (mean_wlen >= 2.0) & (mean_wlen <= 12.0)
    punct_ok = punct_ratio <= 0.2
    return F.round(
        (len_ok.cast("int") + wlen_ok.cast("int") + punct_ok.cast("int"))
        / F.lit(3.0),
        6,
    )


def marker_hits(col: Column, markers: list[str]) -> Column:
    """How many tokens of ``col`` are in the marker set (array_intersect
    over the word array — set semantics, duplicate-safe)."""
    w = words(col)
    hits = F.filter(w, lambda x: x.isin(*markers))
    return F.size(hits)


def lang_id(col: Column) -> Column:
    """argmax over per-language marker-hit counts; 'und' when no
    marker fires.  Ties break by language-code order (deterministic)."""
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang in sorted(LANG_MARKERS):  # deterministic tie-break: first wins
        h = marker_hits(col, LANG_MARKERS[lang])
        is_better = h > best_hits
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(is_better, h).otherwise(best_hits)
    return best_lang


def fingerprint(col: Column) -> Column:
    """60-bit content fingerprint of the normalized text (the rolling-
    hash analogue, md5-based for engine portability)."""
    return portable_hash60(normalize_text(col))


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(c),
            "n_tokens_bpe": token_count_bpe(c),
            "quality": quality_score(c),
            "pred_lang": lang_id(c),
            "fingerprint": fingerprint(c),
        }
    )


# ---------------------------------------------------------------------------
# Repetition metrics (Gopher §A1.1-style): how much of a document is
# repeated content.  n-gram metrics are explode + two groupBys keyed on
# the doc id — linear in corpus size, map-side combine collapses the
# per-partition counts, no Python anywhere.

#: stop words for the Gopher "contains ≥2 stop words" rule
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _doc_ngrams(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id, gram) exploded word n-grams of the normalized text —
    EMPTY for docs shorter than n words (cf. dedup._gram_index)."""
    from vector_spark.datapipe.dedup import _gram_index

    w = words(F.col(text_col))
    grams = F.transform(
        _gram_index(w, n),
        lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
    )
    return df.select(F.col(id_col), F.explode(grams).alias("gram"))


def repetition_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 2,
    dup_n: int = 5,
) -> DataFrame:
    """Per-doc n-gram repetition metrics (the Gopher repetition rules):

    - ``top{top_n}gram_char_frac``: characters of the single most
      frequent ``top_n``-gram (count × gram length) over all n-gram
      characters.  Tie-break: lexicographically greatest gram (a
      max(struct) both engines order identically).
    - ``dup{dup_n}gram_char_frac``: characters of ``dup_n``-grams
      occurring more than once (count × length summed) over all
      n-gram characters.

    Docs with no n-grams (shorter than n words) score 0.0.  Output:
    (id, top..., dup...) — one row per input doc."""
    top = (
        _doc_ngrams(df, text_col, id_col, top_n)
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.max(F.struct(F.col("cnt"), F.col("gram"))).alias("_top"),
            F.sum(F.col("cnt") * F.length("gram")).alias("_chars"),
        )
        .select(
            id_col,
            F.round(
                F.col("_top.cnt")
                * F.length(F.col("_top.gram"))
                / F.col("_chars"),
                6,
            ).alias(f"top{top_n}gram_char_frac"),
        )
    )
    dup = (
        _doc_ngrams(df, text_col, id_col, dup_n)
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(F.col("cnt") > 1, F.col("cnt") * F.length("gram"))
                .otherwise(0)
            ).alias("_dupc"),
            F.sum(F.col("cnt") * F.length("gram")).alias("_chars"),
        )
        .select(
            id_col,
            F.round(F.col("_dupc") / F.col("_chars"), 6).alias(
                f"dup{dup_n}gram_char_frac"
            ),
        )
    )
    out = (
        df.select(id_col)
        .join(top, id_col, "left")
        .join(dup, id_col, "left")
        .fillna(0.0)
    )
    return out


def line_repetition_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc duplicate-LINE metrics (Gopher): fraction of lines that
    are repeats of an earlier identical line, and fraction of
    characters inside those repeated occurrences.  Lines split on \\n;
    a single-line doc scores (0.0, 0.0).  One explode + two groupBys
    on the doc id."""
    lines = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    )
    per_line = lines.groupBy(id_col, "line").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        per_line.groupBy(id_col)
        .agg(
            F.sum("cnt").alias("_n"),
            F.sum(F.col("cnt") - 1).alias("_ndup"),
            F.sum(F.col("cnt") * F.length("line")).alias("_chars"),
            F.sum((F.col("cnt") - 1) * F.length("line")).alias("_dchars"),
        )
        .select(
            id_col,
            F.round(F.col("_ndup") / F.col("_n"), 6).alias("dup_line_frac"),
            F.round(
                F.col("_dchars") / F.greatest(F.col("_chars"), F.lit(1)), 6
            ).alias("dup_line_char_frac"),
        )
    )


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_wlen: float = 3.0,
    max_mean_wlen: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher rule-based quality flags + C4-style extras, all pure
    Column expressions (one projection, no shuffle):

    - ``words_ok``: word count in [min_words, max_words]
    - ``wlen_ok``: mean word length in [min_mean_wlen, max_mean_wlen]
    - ``symbol_ok``: (# + …/... occurrences) / words ≤ max_symbol_ratio
    - ``alpha_ok``: fraction of words containing ≥1 alphabetic char
      ≥ min_alpha_word_frac
    - ``stop_ok``: ≥ min_stopwords hits from the Gopher stop-word set
      (occurrence count, duplicates count)
    - ``no_braces`` / ``no_lorem``: C4 code/boilerplate tripwires
    - ``keep``: conjunction of all flags

    Output: (id, n_words, mean_word_len, flags..., keep)."""
    norm = normalize_text(F.col(text_col))
    w = F.split(norm, " ")
    n_words = F.size(w)
    n1 = F.greatest(n_words, F.lit(1))
    # normalized text is single-space-joined, so sum(word lengths) ==
    # length(norm) - (n_words - 1) — no per-word fold needed
    mean_wlen = F.round((F.length(norm) - n_words + 1) / n1, 6)
    symbols = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"#|\.\.\.|…"), 0)
    )
    alpha_words = F.size(F.filter(w, lambda x: x.rlike("[a-z]")))
    stop_hits = F.size(
        F.filter(w, lambda x: x.isin(*GOPHER_STOPWORDS))
    )
    flags = {
        "words_ok": (n_words >= min_words) & (n_words <= max_words),
        "wlen_ok": (mean_wlen >= min_mean_wlen)
        & (mean_wlen <= max_mean_wlen),
        "symbol_ok": symbols / n1 <= max_symbol_ratio,
        "alpha_ok": alpha_words / n1 >= min_alpha_word_frac,
        "stop_ok": stop_hits >= min_stopwords,
        "no_braces": ~F.col(text_col).contains("{"),
        "no_lorem": ~F.lower(F.col(text_col)).contains("lorem ipsum"),
    }
    keep = F.lit(True)
    for c in flags.values():
        keep = keep & c
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        *[c.alias(name) for name, c in flags.items()],
        keep.alias("keep"),
    )


# ---------------------------------------------------------------------------
# corpus-level boilerplate detection (cross-doc frequent n-grams)


def frequent_ngram_hashes(
    df: DataFrame,
    *,
    n: int = 5,
    min_doc_frac: float = 0.01,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashes of word ``n``-grams whose DOCUMENT frequency is at least
    ``min_doc_frac`` of the corpus — headers, footers, cookie banners,
    license blurbs: the cross-doc repetition that within-doc metrics
    (:func:`repetition_metrics`) cannot see.

    Returns (gram_h, doc_freq).  Grams are reduced to the portable
    60-bit hash mod 2^31-1 BEFORE the frequency groupBy, so the
    corpus-wide shuffle moves 8-byte keys, never gram strings; the
    document-count threshold is a one-row count aggregate broadcast
    in (no driver action — the plan stays lazy).  The result is the
    head of a Zipf distribution — tiny, broadcastable."""
    from vector_spark.datapipe.dedup import HASH_MOD, portable_hash60

    grams = _doc_ngrams(df, text_col, id_col, n).select(
        id_col, (portable_hash60(F.col("gram")) % HASH_MOD).alias("gram_h")
    )
    freq = grams.distinct().groupBy("gram_h").agg(
        F.count(F.lit(1)).alias("doc_freq")
    )
    total = df.select(F.count(F.lit(1)).alias("_n_docs"))
    return (
        freq.join(F.broadcast(total))
        .filter(F.col("doc_freq") >= F.ceil(F.lit(min_doc_frac) * F.col("_n_docs")))
        .drop("_n_docs")
    )


def boilerplate_metrics(
    df: DataFrame,
    *,
    n: int = 5,
    min_doc_frac: float = 0.01,
    flag_frac: float = 0.3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc boilerplate coverage: the fraction of the doc's n-gram
    positions covered by corpus-frequent n-grams, plus an
    ``is_boilerplate`` flag at ``flag_frac`` coverage (compared as
    integers — ``hits * q > n_grams * p`` — so the flag cannot drift
    across engines/float orders).

    Output: (id, n_grams, boiler_hits, boiler_frac, is_boilerplate),
    one row per input doc; docs with no n-grams score 0 / unflagged.

    Scale shape: the frequent set (Zipf head) broadcasts; hit counting
    inner-joins the exploded grams to it FIRST, so only matching
    positions reach the per-doc groupBy — the corpus-sized explosion
    is never shuffled.  Total positions come straight from the doc row
    (``greatest(n_words - n + 1, 0)``), not from aggregating the
    explosion."""
    from fractions import Fraction

    from vector_spark.datapipe.dedup import HASH_MOD, portable_hash60

    fr = Fraction(flag_frac).limit_denominator(10**6)
    freq = frequent_ngram_hashes(
        df, n=n, min_doc_frac=min_doc_frac, text_col=text_col, id_col=id_col
    ).select("gram_h")
    hits = (
        _doc_ngrams(df, text_col, id_col, n)
        .select(id_col, (portable_hash60(F.col("gram")) % HASH_MOD).alias("gram_h"))
        .join(F.broadcast(freq), "gram_h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("boiler_hits"))
    )
    n_grams = F.greatest(
        F.size(words(F.col(text_col))) - (n - 1), F.lit(0)
    ).cast("long")
    return (
        df.select(F.col(id_col), n_grams.alias("n_grams"))
        .join(hits, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce("boiler_hits", F.lit(0)).cast("long").alias("boiler_hits"),
            F.round(
                F.when(F.col("n_grams") > 0,
                       F.coalesce("boiler_hits", F.lit(0)) / F.col("n_grams"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("boiler_frac"),
            (
                F.coalesce("boiler_hits", F.lit(0)) * fr.denominator
                > F.col("n_grams") * fr.numerator
            ).alias("is_boilerplate"),
        )
    )


def chunk_documents(
    df: DataFrame,
    *,
    chunk_tokens: int = 256,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-token windows with overlap — the
    chunking step every embedding / RAG / long-context training
    pipeline runs before vectorizing or packing.  Stride =
    ``chunk_tokens - overlap``; the final window keeps the tail (a doc
    shorter than one chunk yields exactly one chunk; empty docs yield
    none).

    Spark-first: pure Column expressions — whitespace tokenization
    (normalize + split, the shared _tokens convention), a
    `sequence(0, n_chunks-1)` index array, `transform` slicing, and
    ONE posexplode.  No shuffle, no Python; chunk multiplicity is
    bounded by ceil(n_tokens / stride), so output size is linear in
    corpus tokens at any scale.  For BPE-budgeted chunks run the same
    shape over `bpe.encode_tokens` output instead of words.

    Output: (id, chunk_idx, n_chunks, chunk_text, chunk_tokens).
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    stride = chunk_tokens - overlap
    words = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda t: t != ""
    )
    n = F.size(words)
    # windows start at 0, stride, 2*stride, ... while start < n; the
    # last window may be short (tail kept, never dropped)
    n_chunks = F.when(
        n <= chunk_tokens, F.least(n, F.lit(1))
    ).otherwise(
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)).cast("int") + 1
    )
    idx = F.when(
        n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        idx,
        lambda i: F.array_join(
            F.slice(words, i * stride + 1, chunk_tokens), " "
        ),
    )
    exploded = df.select(
        F.col(id_col), n_chunks.alias("n_chunks"),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    )
    return exploded.select(
        id_col, "chunk_idx", "n_chunks", "chunk_text",
        F.size(
            F.filter(F.split(F.col("chunk_text"), " "),
                     lambda t: t != "")
        ).alias("chunk_n_tokens"),
    )
