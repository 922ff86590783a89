"""Exact-substring span dedup: hand-computed coverage, within-doc
repeats, merged-interval union (not sum), short-doc pass-out, and the
plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.datapipe.span_dedup import (
    duplicated_spans,
    span_dedup_stats,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_doc_duplicated_span_hand_computed(spark):
    # docs share exactly the 3-gram "c d e" (and nothing longer)
    df = _df(spark, [
        (1, "a b c d e f g h"),
        (2, "x y c d e z w q"),
    ])
    dups = duplicated_spans(df, k=3).collect()
    got = {(r["doc_id"], r["pos"]) for r in dups}
    assert got == {(1, 2), (2, 2)}  # "c d e" starts at word index 2

    stats = {r["doc_id"]: r for r in span_dedup_stats(df, k=3).collect()}
    for d in (1, 2):
        assert stats[d]["n_tokens"] == 8
        assert stats[d]["dup_tokens"] == 3  # the union covers c,d,e
        assert stats[d]["dup_frac_milli"] == 375


def test_overlapping_spans_merge_not_sum(spark):
    # "c d e f" shared -> two overlapping dup 3-grams in each doc
    # (c d e @2, d e f @3): union covers 4 words, not 6
    df = _df(spark, [
        (1, "a b c d e f g h"),
        (2, "x y c d e f z w"),
    ])
    stats = {r["doc_id"]: r for r in span_dedup_stats(df, k=3).collect()}
    assert stats[1]["dup_tokens"] == 4
    assert stats[2]["dup_tokens"] == 4


def test_within_doc_repeat_counts(spark):
    # the SAME doc repeats "p q r" twice: ExactSubstr counts any
    # repeat, including self-repeats
    df = _df(spark, [(1, "p q r s t p q r"), (2, "m n o u v w x y")])
    stats = {r["doc_id"]: r for r in span_dedup_stats(df, k=3).collect()}
    assert stats[1]["dup_tokens"] == 6  # both occurrences covered
    assert stats[2]["dup_tokens"] == 0


def test_disjoint_dup_spans_sum(spark):
    # two separated shared 3-grams -> coverage 3 + 3
    df = _df(spark, [
        (1, "c d e m m m f g h n n n"),
        (2, "c d e z z z f g h y y y"),
    ])
    stats = {r["doc_id"]: r for r in span_dedup_stats(df, k=3).collect()}
    # shared: "c d e" @0 and "f g h" @6 in both docs
    assert stats[1]["dup_tokens"] == 6
    assert stats[2]["dup_tokens"] == 6


def test_short_and_null_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, None), (3, "a b c d e f g h"),
         (4, "q w e r t y u i")],
        "doc_id long, text string",
    )
    stats = {r["doc_id"]: r for r in span_dedup_stats(df, k=3).collect()}
    assert set(stats) == {1, 3, 4}, "NULL text excluded, short docs kept"
    assert stats[1]["dup_tokens"] == 0 and stats[1]["n_tokens"] == 2
    assert stats[3]["dup_tokens"] == 0  # nothing shared
    assert stats[4]["dup_tokens"] == 0


def test_exact_clone_is_fully_covered(spark):
    text = "one two three four five six seven eight nine ten"
    df = _df(spark, [(1, text), (2, text)])
    stats = {r["doc_id"]: r for r in span_dedup_stats(df, k=5).collect()}
    for d in (1, 2):
        assert stats[d]["dup_tokens"] == 10
        assert stats[d]["dup_frac_milli"] == 1000


def test_plan_shape(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        span_dedup_stats(df, k=13)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan
    # the dup-span filter is a semi join on the 8-byte hash
    assert "LeftSemi" in plan
