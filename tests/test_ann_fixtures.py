"""Guard the pinned oracle fixtures in vector_spark/data/.

The round-5 ANN/BPE oracles replay PINNED constants (offline-trained
IVF centroids, PQ codebooks, golden naive-reference BPE counts).  If
the trainers or the gate corpus drift, the pins must be regenerated
with tools/build_ann_fixtures.py — these tests turn silent drift into
a red test instead of a red driver row.
"""

from __future__ import annotations

from collections import Counter

from tests.conftest import SF_DIR


def test_ivf_centroid_pins_match_trainer(spark):
    from vector_spark.data.ann_fixtures import IVF_CENTROIDS
    from vector_spark.datapipe.similarity import ivf_train_centroids

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assert ivf_train_centroids(emb, k=8) == IVF_CENTROIDS


def test_pq_codebook_pins_match_trainer(spark):
    from vector_spark.data.ann_fixtures import PQ_CODEBOOKS
    from vector_spark.datapipe.similarity import pq_train_codebooks

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assert pq_train_codebooks(emb, m=16, ksub=16) == PQ_CODEBOOKS


def test_bpe_golden_matches_naive_reference():
    """Regenerate the golden counts with the independent naive
    reference (same recipe as tools/build_ann_fixtures.py) and compare
    to the pins — the fixture must stay a faithful rendering of the
    naive implementation, never of the engine."""
    import pyarrow.parquet as pq

    from tests.test_bpe import naive_encode, naive_learn
    from vector_spark.data.bpe_golden import BPE_GOLDEN_COUNTS
    from vector_spark.datapipe.bpe import pretokenize

    t = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    docs = list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    c: Counter = Counter()
    for _, text in docs:
        if text is not None:
            c.update(pretokenize(text))
    word_counts = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:50_000]
    merges = naive_learn(word_counts, 48)
    golden = {
        int(doc_id): len(naive_encode(text, merges))
        for doc_id, text in docs
        if text is not None
    }
    assert golden == BPE_GOLDEN_COUNTS
