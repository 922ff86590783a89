"""Text analysis: token counting, quality scoring, language ID,
document fingerprinting — all built-in expressions (portable to the
DuckDB oracle; zero Python in the hot path)."""

from __future__ import annotations

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
