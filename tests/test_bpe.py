"""Byte-level BPE: parity against an independent naive reference
implementation (different algorithmic formulation), lossless
round-trips, Spark kernel vs driver-side encoding, and integration
with the token-budget ops."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from vector_spark.datapipe.bpe import (
    BYTE_VOCAB,
    bpe_decode,
    bpe_encode,
    bpe_token_count,
    bpe_token_counts,
    bpe_vocab,
    learn_bpe,
    learn_bpe_from_counts,
    pretokenize,
)

# --- independent naive reference (no incremental bookkeeping, no
# greedy-rank loop: trains by full recount each round, encodes by
# applying merges sequentially in rank order) ------------------------


def naive_learn(word_counts, num_merges):
    words = {i: list(w.encode("utf-8")) for i, (w, _) in enumerate(word_counts)}
    freqs = {i: c for i, (_, c) in enumerate(word_counts)}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for i, w in words.items():
            for p in zip(w, w[1:]):
                pairs[p] += freqs[i]
        if not pairs:
            break
        best, best_c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best_c < 2:
            break
        new_id = BYTE_VOCAB + len(merges)
        merges.append(best)
        for i, w in words.items():
            out, j = [], 0
            while j < len(w):
                if (
                    j < len(w) - 1
                    and w[j] == best[0]
                    and w[j + 1] == best[1]
                ):
                    out.append(new_id)
                    j += 2
                else:
                    out.append(w[j])
                    j += 1
            words[i] = out
    return merges


def naive_encode(text, merges):
    ids = []
    for w in pretokenize(text):
        toks = list(w.encode("utf-8"))
        for rank, (a, b) in enumerate(merges):
            out, j = [], 0
            while j < len(toks):
                if j < len(toks) - 1 and toks[j] == a and toks[j + 1] == b:
                    out.append(BYTE_VOCAB + rank)
                    j += 2
                else:
                    out.append(toks[j])
                    j += 1
            toks = out
        ids.extend(toks)
    return ids


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the the the and and of of of to is",
    "def quick_sort(xs): return xs if len(xs) < 2 else None",
    "import numpy as np\nnp.zeros((3, 3))",
    "人工智能模型训练数据",
    "café naïve résumé — über",
    "it's we're they've I'll you'd",
    "aaaa aaaa aaaa bbbb aaaa",
    "1234 5678 1234 90 1234",
]


def _word_counts(texts):
    c = Counter()
    for t in texts:
        c.update(pretokenize(t))
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))


def test_training_matches_naive_reference():
    wc = _word_counts(CORPUS)
    assert learn_bpe_from_counts(wc, 200) == naive_learn(wc, 200)


def test_encode_matches_naive_sequential_application():
    """Greedy lowest-rank-loop encoding == applying merges in rank
    order (the defining equivalence of BPE inference)."""
    from vector_spark.datapipe.bpe import _encoder

    merges = learn_bpe_from_counts(_word_counts(CORPUS), 100)
    enc = _encoder(merges)
    for t in CORPUS:
        mine = [i for w in pretokenize(t) for i in enc(w)]
        assert mine == naive_encode(t, merges), t


def test_pretokens_tile_the_input():
    for t in CORPUS + ["", " ", "  leading", "trailing  ", "a\t\nb"]:
        assert "".join(pretokenize(t)) == t


def test_roundtrip_lossless():
    merges = learn_bpe_from_counts(_word_counts(CORPUS), 150)
    from vector_spark.datapipe.bpe import _encoder

    enc = _encoder(merges)
    for t in CORPUS + ["emoji \U0001f600\U0001f680 mix", "_under_score_"]:
        ids = [i for w in pretokenize(t) for i in enc(w)]
        assert bpe_decode(ids, merges) == t
        assert len(ids) <= len(t.encode("utf-8"))


def test_training_is_deterministic():
    wc = _word_counts(CORPUS)
    assert learn_bpe_from_counts(wc, 64) == learn_bpe_from_counts(wc, 64)
    v = bpe_vocab(learn_bpe_from_counts(wc, 64))
    assert len(v) == BYTE_VOCAB + len(learn_bpe_from_counts(wc, 64))


def test_spark_kernel_matches_driver_side(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(60)
        .cache()
    )
    merges = learn_bpe(docs, num_merges=256, max_words=5000)
    assert merges, "fixture corpus must yield merges"
    # same-corpus determinism across a second distributed run
    assert merges == learn_bpe(docs, num_merges=256, max_words=5000)
    got = {
        r["doc_id"]: (r["ids"], r["n"])
        for r in docs.select(
            "doc_id",
            bpe_encode(F.col("text"), merges).alias("ids"),
            bpe_token_count(F.col("text"), merges).alias("n"),
        ).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        want = naive_encode(row["text"], merges)
        ids, n = got[row["doc_id"]]
        assert list(ids) == want
        assert n == len(want)
        assert bpe_decode(ids, merges) == row["text"]


def test_null_text_passes_through(spark):
    df = spark.createDataFrame([(1, "hello hello"), (2, None)], "id int, text string")
    merges = learn_bpe_from_counts([("hello", 5), (" hello", 4)], 32)
    rows = {
        r["id"]: r["n"]
        for r in bpe_token_counts(df, merges).select(
            "id", F.col("n_bpe_tokens").alias("n")
        ).collect()
    }
    assert rows[1] is not None and rows[1] > 0
    assert rows[2] is None


def test_bpe_counts_feed_token_budget_ops(spark):
    """pack_sequences(token_col=) over real BPE counts: offsets are the
    exact exclusive prefix sum of the BPE counts in id order."""
    from vector_spark.datapipe.packing import pack_sequences

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(80)
    merges = learn_bpe(docs, num_merges=128, max_words=2000)
    counted = bpe_token_counts(docs, merges)
    packed = pack_sequences(
        counted, budget=512, token_col="n_bpe_tokens"
    ).orderBy("doc_id")
    rows = packed.collect()
    run = 0
    for r in rows:
        assert r["token_offset"] == run
        assert r["seq_id"] == run // 512
        assert r["seq_offset"] == run % 512
        run += r["n_tokens"]


def test_whitespace_counts_misbudget_code_and_cjk():
    """The motivating gap: whitespace counting diverges >=2x from
    subword counting on code and CJK — the reason token budgets accept
    real tokenizer counts."""
    from vector_spark.datapipe.bpe import _encoder

    merges = learn_bpe_from_counts(_word_counts(CORPUS), 50)
    enc = _encoder(merges)
    for t in (
        "def f(x,y):return(x+y)*g(x,y)//h(x,y)",
        "训练数据管道需要真实"
        "子词计数",
    ):
        n_ws = len(t.split())
        n_bpe = sum(len(enc(w)) for w in pretokenize(t))
        assert n_bpe >= 2 * n_ws
