"""Datapipe behavior tests beyond the SQL oracles: LSH recall against
exact ground truth, simhash near-dup property, multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vector_spark.datapipe.dedup import (
    hamming_distance,
    jaccard_pairs,
    lsh_candidates,
    minhash_signatures,
    simhash,
)
from vector_spark.datapipe.multimodal import (
    extract_features,
    frame_sample_plan,
    synth_media,
)
from vector_spark.datapipe.similarity import ann_topk, cosine_topk
from vector_spark.queries_datapipe import _dup_df


def test_minhash_lsh_finds_planted_near_dups(spark):
    """Every planted perturbed copy (id+2000000) must surface as a
    high-jaccard pair with its original; exact clones (id+1000000) as
    jaccard 1.0."""
    dup = _dup_df(spark, SF_DIR)
    sigs = minhash_signatures(dup)
    cand = lsh_candidates(sigs)
    pairs = jaccard_pairs(dup, cand, threshold=0.5).collect()
    found = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    exact_ids = [r[0] for r in docs.filter("doc_id % 10 = 0").select("doc_id").collect()]
    near_ids = [r[0] for r in docs.filter("doc_id % 7 = 0").select("doc_id").collect()]

    exact_hits = sum((i, i + 1000000) in found for i in exact_ids)
    near_hits = sum((i, i + 2000000) in found for i in near_ids)
    assert exact_hits / len(exact_ids) == 1.0
    for i in exact_ids:
        assert found[(i, i + 1000000)] == 1.0
    # near dups differ by a 3-word tail: jaccard still ~0.9; LSH with
    # 4x4 bands should catch nearly all
    assert near_hits / len(near_ids) >= 0.9


def test_lsh_bucket_cap_bounds_degenerate_corpus(spark):
    """1k identical docs share every band key: uncapped LSH would emit
    ~500k candidate pairs (O(bucket²)); the bucket cap must bound the
    output, the stats helper must report exactly what was skipped, and
    a normal corpus must be unaffected by the default cap."""
    from vector_spark.datapipe.dedup import lsh_bucket_stats

    clones = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.lit("the same degenerate document text repeated many words "
              "to make shingles").alias("text"),
    )
    sigs = minhash_signatures(clones)
    capped = lsh_candidates(sigs, max_bucket=100)
    assert capped.count() == 0  # every bucket oversized → skipped
    stats = lsh_bucket_stats(sigs, max_bucket=100).first()
    assert stats["n_oversized"] == stats["n_buckets"] > 0
    assert stats["rows_in_oversized"] == 1000 * stats["n_buckets"]
    # uncapped path still exists for small corpora
    assert lsh_candidates(sigs.limit(50), max_bucket=None).count() == 50 * 49 // 2

    # normal corpus: default cap changes nothing
    dup = _dup_df(spark, SF_DIR)
    s2 = minhash_signatures(dup)
    assert (
        lsh_candidates(s2).exceptAll(lsh_candidates(s2, max_bucket=None)).count()
        == 0
    )


def test_jaccard_shingle_df_cap_bounds_boilerplate(spark):
    """A stop-phrase shingle shared by every doc makes the intersection
    join quadratic; max_shingle_df must drop it while near-dups are
    still found via their distinctive shingles."""
    from vector_spark.datapipe.dedup import jaccard_pairs

    boiler = "please see the attached log output for details"
    rows = [(i, f"{boiler} unique document body number {i} alpha beta")
            for i in range(50)]
    rows += [(1000, rows[0][1]), (1001, rows[1][1])]  # true dups of 0, 1
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = jaccard_pairs(df, threshold=0.9, max_shingle_df=10)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (0, 1000) in got and (1, 1001) in got
    # boilerplate-only overlap must not produce pairs
    assert all(a in (0, 1) for a, _ in got)

    # and the capped shingle volume is visibly bounded: every pair's
    # intersection came from the distinctive shingles only
    uncapped = jaccard_pairs(df, threshold=0.9)
    assert {(r["id_a"], r["id_b"]) for r in uncapped.collect()} >= got


def test_simhash_plan_has_no_bit_explosion(spark):
    """The de-exploded simhash: the 32 bit-votes are conditional sums
    inside one groupBy — the plan must not explode sequence(0,31) (the
    old 32× row blowup) and only the shingle Generate may remain."""
    dup = _dup_df(spark, SF_DIR)
    plan = simhash(dup)._jdf.queryExecution().executedPlan().toString()
    assert "sequence(0, 31" not in plan
    # exactly one Generate: the shingle explode (by design)
    assert plan.count("Generate explode") == 1
    # two shuffles: the (doc, h) distinct and the groupBy(doc) vote
    # sums — the second moves only 32 partial sums per doc-partition;
    # no third exchange may appear
    assert plan.count("Exchange hashpartitioning") == 2
    # the vote aggregation itself must stay in whole-stage codegen
    # (the collect_set + higher-order-filter variant fell back to
    # interpreted evaluation and measured ~11% slower)
    assert "collect_set" not in plan


def test_short_and_empty_docs_do_not_crash_shingling(spark):
    """Docs with fewer words than the shingle width used to compile to
    slice(words, 0, n) and crash the whole job
    (INVALID_PARAMETER_VALUE.START); they must simply produce zero
    shingles and drop out of signature outputs, matching the DuckDB
    oracle's range(greatest(len-2,0)) semantics."""
    from vector_spark.datapipe.dedup import shingle_hash_array, shingles

    df = spark.createDataFrame(
        [(1, "one two"), (2, ""), (3, "a b c d e"), (4, "   "), (5, None)],
        "doc_id long, text string",
    )
    rows = shingles(df.filter("text is not null")).collect()
    assert {r["doc_id"] for r in rows} == {3}
    assert minhash_signatures(df.filter("text is not null")).count() == 1
    assert simhash(df.filter("text is not null")).count() == 1
    arrs = (
        df.filter("text is not null")
        .select("doc_id", shingle_hash_array().alias("hs"))
        .collect()
    )
    assert {r["doc_id"]: len(r["hs"]) for r in arrs} == {1: 0, 2: 0, 3: 3, 4: 0}


def test_simhash_near_dups_are_hamming_close(spark):
    dup = _dup_df(spark, SF_DIR)
    sh = simhash(dup)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"))
    b = sh.select(
        (F.col("doc_id") + 2000000).alias("id_a"),
        F.col("simhash").alias("sh_b"),
    )
    joined = a.join(b, "id_a").withColumn(
        "ham", hamming_distance(F.col("sh_a"), F.col("sh_b"))
    )
    stats = joined.agg(F.max("ham"), F.count(F.lit(1))).collect()[0]
    assert stats[1] > 0
    assert stats[0] <= 8  # perturbed copies stay within 8/32 bits


def test_ann_recall_vs_exact(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=5).collect()
    # this corpus's exact top-5 sit at LOW cosine (~0.3: no true
    # near-dups), so recall needs wide buckets + many tables; measured
    # here: 3x32 → 0.91, 4x24 → 0.72, 8x8 → ~0.5
    approx = ann_topk(emb, queries, k=5, n_planes=3, n_tables=32).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.8, f"ANN recall {recall} too low for 3x32 LSH"
    # candidates actually restricted: approx scored fewer pairs than brute force
    assert len(approx_set) <= len(exact_set)


def test_ivf_recall_vs_exact(spark):
    """IVF coarse-quantizer ANN: recall vs brute force with n_probe=6
    of 8 lists; deterministic centroids (fixed seed + ordered sample)."""
    from vector_spark.datapipe.similarity import ivf_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=5).collect()
    # like the LSH test: this corpus's true top-k sit at low cosine
    # (~0.3), so high recall needs probing most lists (measured: 8/6 →
    # 0.95, 8/4 → 0.69); real near-dup corpora need far fewer probes
    approx = ivf_topk(emb, queries, k=5, n_lists=8, n_probe=6).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.8, f"IVF recall {recall} too low (8 lists, probe 6)"
    assert len(approx_set) <= len(exact_set)
    # deterministic across reruns
    again = ivf_topk(emb, queries, k=5, n_lists=8, n_probe=6).collect()
    assert {(r["query_id"], r["neighbor_id"]) for r in again} == approx_set


def test_near_dup_pairs_vs_exact_verifier(spark):
    """Bucketized near-dup (the scale path) against the all-pairs exact
    verifier: every planted clone pair must be recovered, and nothing
    outside the exact set may appear (precision 1.0 by construction —
    candidates are exactly rescored)."""
    from vector_spark.datapipe.similarity import all_pairs_cosine, near_dup_pairs
    from vector_spark.queries_datapipe import _aug_emb

    aug = _aug_emb(spark, SF_DIR).persist()
    got = {
        (r["id_a"], r["id_b"])
        for r in near_dup_pairs(aug, threshold=0.9).collect()
    }
    truth = {
        (r["id_a"], r["id_b"])
        for r in all_pairs_cosine(aug, threshold=0.9).collect()
    }
    aug.unpersist()
    assert truth, "verifier found no near-dup pairs — planting broken"
    assert got <= truth  # exact rescoring → no false positives
    recall = len(got & truth) / len(truth)
    assert recall >= 0.95, f"near-dup recall {recall} too low for 8x8 LSH"


def test_multimodal_feature_plumbing(spark):
    media = synth_media(spark, 64)
    feats = extract_features(media, dim=8)
    rows = feats.collect()
    assert len(rows) == 64
    for r in rows:
        assert r["ok"] and r["n_bytes"] > 0 and len(r["feat"]) == 8
    # deterministic: same input -> same features
    again = extract_features(media, dim=8).collect()
    assert sorted(r["feat"] for r in rows) == sorted(r["feat"] for r in again)


def test_multimodal_real_decode_unknown_formats_flag_not_raise(spark):
    """fake=False on payloads without a pure-Python decoder (the
    synthetic BLOB bytes stand in for JPEG/PNG): per-row ok=false with
    NULL features — the error-channel convention — never a job kill.
    Real BMP/PPM/WAV decode is covered in tests/test_media_codecs.py."""
    media = synth_media(spark, 4)
    rows = extract_features(media, fake=False).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["ok"] is False and r["feat"] is None


def test_frame_sample_plan(spark):
    media = synth_media(spark, 30)
    frames = frame_sample_plan(media, every_ms=500)
    got = frames.groupBy("media_id").count().collect()
    durations = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter("kind = 'video'").collect()
    }
    assert {r["media_id"] for r in got} == set(durations)
    for r in got:
        expected = (max(durations[r["media_id"]] - 1, 0)) // 500 + 1
        assert r["count"] == expected


def test_resize_and_audio_chunk_plans(spark):
    from vector_spark.datapipe.multimodal import (
        audio_chunk_plan,
        resize_plan,
        synth_media,
    )

    media = synth_media(spark, 60)
    resized = resize_plan(media, 64, 64).collect()
    n_images = media.filter("kind = 'image'").count()
    assert len(resized) == n_images > 0
    for r in resized:
        assert max(r["out_w"], r["out_h"]) <= 64 and r["ok"]

    chunks = audio_chunk_plan(media, chunk_ms=700, overlap_ms=200)
    got = chunks.groupBy("media_id").count().collect()
    durations = {r["media_id"]: r["duration_ms"]
                 for r in media.filter("kind = 'audio'").collect()}
    assert {r["media_id"] for r in got} == set(durations)
    for r in got:
        expected = (max(durations[r["media_id"]] - 1, 0)) // 500 + 1
        assert r["count"] == expected
    # chunk windows never exceed the chunk length
    assert chunks.filter(
        F.col("chunk_end_ms") > F.col("chunk_start_ms") + 700
    ).count() == 0

    import pytest as _pytest
    with _pytest.raises(ValueError, match="overlap"):
        audio_chunk_plan(media, chunk_ms=500, overlap_ms=500)


def test_media_features_feed_similarity_search(spark):
    """End-to-end multimodal → embedding plumbing: extracted feature
    vectors flow straight into the similarity operators."""
    from vector_spark.datapipe.multimodal import extract_features, synth_media
    from vector_spark.datapipe.similarity import cosine_topk

    media = synth_media(spark, 64)
    feats = extract_features(media, dim=16).select(
        F.col("media_id").alias("vec_id"),
        F.col("feat").alias("embedding"),
    )
    queries = feats.filter(F.col("vec_id") < 3)
    topk = cosine_topk(feats, queries, k=3)
    rows = topk.collect()
    assert len(rows) == 9  # 3 queries x top-3
    assert all(r["cos"] is not None for r in rows)


def test_repetition_metrics_known_values(spark):
    """Hand-computed Gopher repetition fractions on tiny docs."""
    from vector_spark.datapipe.text import repetition_metrics

    df = spark.createDataFrame(
        [
            # "a b a b a b": 2-grams = [a b, b a, a b, b a, a b]
            # top gram "b a" (ties 2 vs 3? counts: "a b"x3, "b a"x2)
            # top = "a b" (cnt 3, len 3) / total chars 15 = 0.6
            (1, "a b a b a b"),
            # no repeated 5-gram, 7 words -> three 5-grams all distinct
            (2, "one two three four five six seven"),
            # doc shorter than both gram widths -> (0, 0)
            (3, "x"),
            # duplicated 5-gram: the 5-gram window repeats exactly
            (4, "p q r s t p q r s t p q r s t"),
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r
        for r in repetition_metrics(df, top_n=2, dup_n=5).collect()
    }
    assert abs(got[1]["top2gram_char_frac"] - 0.6) < 1e-9
    assert got[2]["dup5gram_char_frac"] == 0.0
    assert got[3]["top2gram_char_frac"] == 0.0
    assert got[3]["dup5gram_char_frac"] == 0.0
    # doc 4: 15 words -> 11 five-grams; "p q r s t" appears 3x (len 9),
    # windows like "q r s t p" appear 2x ... every 5-gram window repeats
    # except none are unique: positions 0,5,10 are "p q r s t"; the
    # cyclic pattern makes all 11 windows part of a repeating set except
    # the count math: windows 0..10 over period-5 cycle -> window i and
    # i+5 are equal, so counts: i=0..4 -> 3,2,2,2,2 occurrences? compute:
    # distinct windows are the 5 rotations; occurrences 3+2+2+2+2=11.
    # all have cnt>1 -> dup fraction 1.0
    assert abs(got[4]["dup5gram_char_frac"] - 1.0) < 1e-9


def test_line_repetition_metrics_multiline(spark):
    """Duplicate-line fractions over multi-line docs (log payloads)."""
    from vector_spark.datapipe.text import line_repetition_metrics

    df = spark.createDataFrame(
        [
            (1, "alpha\nbeta\nalpha\ngamma"),  # 4 lines, 1 repeat
            (2, "single line only"),
            (3, "x\nx\nx\nx"),  # all repeats of the first
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r for r in line_repetition_metrics(df).collect()
    }
    assert abs(got[1]["dup_line_frac"] - 0.25) < 1e-9
    # repeated chars: one extra "alpha" (5 chars) / 19 total line chars
    assert abs(got[1]["dup_line_char_frac"] - round(5 / 19, 6)) < 1e-9
    assert got[2]["dup_line_frac"] == 0.0
    assert abs(got[3]["dup_line_frac"] - 0.75) < 1e-9


def test_gopher_quality_flags_rules(spark):
    """Each Gopher/C4 rule trips on its designed bad doc."""
    from vector_spark.datapipe.text import gopher_quality_flags

    good = "the quick brown fox jumps over the lazy dog and that " * 6
    df = spark.createDataFrame(
        [
            (1, good),  # passes everything (60 words, stopwords, alpha)
            (2, "too short"),  # words_ok fails
            (3, good + " " + "# " * 20),  # symbol ratio + alpha fail
            (4, good.replace("the", "xx») {").replace("and", "yy")),
            (5, good + " lorem ipsum dolor"),  # no_lorem fails
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in gopher_quality_flags(df).collect()}
    assert got[1]["keep"]
    assert not got[2]["words_ok"] and not got[2]["keep"]
    assert not got[3]["symbol_ok"]
    assert not got[4]["no_braces"]
    assert not got[5]["no_lorem"]


def test_decontaminate_flags_exact_and_partial_overlap(spark):
    """13-gram decontamination: exact copies and long shared spans are
    flagged; disjoint docs are not; the corpus side is never shuffled
    before the broadcast semi-join."""
    from vector_spark.datapipe.dedup import decontaminate

    span = " ".join(f"w{i}" for i in range(20))  # 20 words -> 8 13-grams
    corpus = spark.createDataFrame(
        [
            (1, span),  # exact copy of benchmark doc
            (2, span + " tail extra words here"),  # superset: all 8 + more
            (3, "completely different text " * 5),
            (4, "short doc"),  # < 13 words: zero grams
        ],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame([(100, span)], "doc_id int, text string")
    got = {
        r["doc_id"]: r["n_contaminated_grams"]
        for r in decontaminate(corpus, bench, n=13).collect()
    }
    assert got[1] == 8  # 20 - 13 + 1
    assert got[2] == 8  # the shared span's grams only
    assert 3 not in got and 4 not in got

    # plan: benchmark side broadcast, corpus side has no Exchange
    # before the semi-join
    plan = (
        decontaminate(corpus, bench, n=13)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_dedup_lines_global_first_wins_and_reassembles(spark):
    """Corpus-global line dedup: first (doc, pos) occurrence survives,
    docs reassemble in original order, fully-claimed docs come back
    empty."""
    from vector_spark.datapipe.dedup import dedup_lines_global

    df = spark.createDataFrame(
        [
            (1, "alpha\nbeta\ngamma"),
            (2, "beta\ndelta"),        # "beta" claimed by doc 1
            (3, "alpha\nbeta\ngamma"),  # fully claimed -> empty
            (4, "epsilon\nepsilon"),    # in-doc dup: second goes too
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r["text"] for r in dedup_lines_global(df).collect()}
    assert got[1] == "alpha\nbeta\ngamma"
    assert got[2] == "delta"
    assert got[3] == ""
    assert got[4] == "epsilon"


def test_dedup_lines_global_empty_line_idempotency(spark):
    """Regression (r3 review): an emptied doc's '' text must not steal
    genuine blank lines on a second pass — empty lines are kept
    verbatim, so the op is idempotent on exactly the counterexample
    that broke the window-based implementation."""
    from vector_spark.datapipe.dedup import dedup_lines_global

    df = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "\nb")], "doc_id int, text string"
    )
    once = dedup_lines_global(df)
    twice = dedup_lines_global(once)
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0
    got = {r["doc_id"]: r["text"] for r in once.collect()}
    assert got == {0: "a", 1: "", 2: "\nb"}

    # scale gate: first-wins must be the map-side-combining min(struct)
    # aggregate, not a per-line row_number window (a boilerplate line
    # duplicated millions of times would route every occurrence to one
    # reducer for a full sort)
    plan = once._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "min(struct(" in plan


def test_xxhash64_fast_path_finds_same_near_dups(spark):
    """portable=False (xxhash64 shingle hashing, measured ~18% faster)
    is a drop-in for production: the end-to-end near-dedup chain kills
    the same exact clones as the oracle-portable md5 path."""
    dup = _dup_df(spark, SF_DIR)

    def kill_list(portable):
        sigs = minhash_signatures(dup, portable=portable)
        pairs = jaccard_pairs(
            dup, lsh_candidates(sigs), threshold=0.9, portable=portable
        )
        return {
            r["doc_id"]
            for r in pairs.select(F.col("id_b").alias("doc_id"))
            .distinct()
            .collect()
        }

    fast, exact = kill_list(False), kill_list(True)
    # exact clones have IDENTICAL signatures under any hash family →
    # they collide in every band and must die on both paths
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    clone_ids = {
        r[0] + 1000000
        for r in docs.filter("doc_id % 10 = 0").select("doc_id").collect()
    }
    assert clone_ids <= fast and clone_ids <= exact
    # near-threshold perturbed pairs may differ per family (band
    # collisions are probabilistic per hash); the disagreement must
    # stay marginal
    assert len(fast ^ exact) <= max(3, len(exact) // 20)


def test_dedup_incremental_phases(spark):
    """Snapshot-vs-corpus ingest dedup: exact clones die in phase 1
    (hash anti-join), near clones die in phase 2 (LSH + jaccard
    rescore), genuinely new docs survive; a precomputed corpus index
    gives the identical answer (the incremental-ingest path)."""
    from vector_spark.datapipe.dedup import build_dedup_index, dedup_incremental

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "observability pipelines route parse and enrich log events at "
                "scale across many regions with windowed aggregates and sinks"),
            (3, "a completely different third document about spark physical plans"),
        ],
        "doc_id long, text string",
    )
    snap = spark.createDataFrame(
        [
            # exact clone of 1 (whitespace/case-normalized)
            (10, "The quick brown fox   jumps over the lazy dog near the river bank"),
            # near clone of 2 (3-word tail appended)
            (11, "observability pipelines route parse and enrich log events at "
                 "scale across many regions with windowed aggregates and sinks "
                 "zz perturbed tail"),
            # genuinely new
            (12, "entirely novel content discussing iceberg snapshot commit protocols today"),
        ],
        "doc_id long, text string",
    )
    ingested = {r["doc_id"] for r in dedup_incremental(snap, corpus).collect()}
    assert ingested == {12}

    # the persisted-index path (build once, reuse per snapshot) must
    # produce the identical accepted set
    idx = build_dedup_index(corpus)
    via_index = {
        r["doc_id"]
        for r in dedup_incremental(snap, corpus, index=idx).collect()
    }
    assert via_index == ingested

    # index-ONLY ingest — no corpus frame at all: the 3-table index
    # (exact hash + bands + shingles) carries everything the rescore
    # needs, so a snapshot ingest does ZERO corpus reads
    no_corpus = {
        r["doc_id"] for r in dedup_incremental(snap, index=idx).collect()
    }
    assert no_corpus == ingested

    # intra-snapshot duplicates are out of scope by contract: two novel
    # docs identical to EACH OTHER but absent from the corpus both land
    twins = spark.createDataFrame(
        [
            (20, "twin document text that is not in the corpus at all whatsoever"),
            (21, "twin document text that is not in the corpus at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    assert dedup_incremental(twins, corpus).count() == 2


def test_dedup_incremental_plan_quality(spark):
    """Scale gates for the ingest path: no cartesian/nested-loop join
    anywhere (every stage is hash-join or aggregate), the exact phase
    is an anti join on the hash, and the index-only variant compiles
    without touching a corpus text column."""
    from vector_spark.datapipe.dedup import build_dedup_index, dedup_incremental

    dup = _dup_df(spark, SF_DIR)
    corpus = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    out = dedup_incremental(dup, corpus)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan  # exact phase + kill-list anti joins

    idx = build_dedup_index(corpus)
    plan2 = (
        dedup_incremental(dup, index=idx)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan2
    assert "BroadcastNestedLoopJoin" not in plan2


def test_dedup_incremental_caps_mass_duplicate_snapshot(spark):
    """A mass-duplicate ingest batch (thousands of near-identical docs
    sharing every band key) must not fan out O(bucket²) against the
    corpus: the snapshot side of the band join is capped symmetrically
    with the corpus side.  The clones pass or fail TOGETHER (none are
    corpus near-dups once the bucket is skipped), and the uncapped
    exact phase still removes true exact clones."""
    from vector_spark.datapipe.dedup import dedup_incremental

    corpus = spark.createDataFrame(
        [(1, "some corpus document words here repeated for realistic size")],
        "doc_id long, text string",
    )
    clones = spark.range(2000).select(
        (F.col("id") + 100).alias("doc_id"),
        F.lit("one mass duplicated snapshot document body with many words "
              "that shares every minhash band").alias("text"),
    )
    out = dedup_incremental(clones, corpus, max_bucket=100)
    # snapshot buckets are oversized → skipped → no corpus candidates →
    # all clones ingest (they are not corpus dups; INTRA-snapshot dedup
    # is out of scope by contract)
    assert out.count() == 2000


def test_pack_sequences_known_values(spark):
    """Exact packing semantics on hand-computed offsets, including a
    doc that straddles a sequence boundary (start-bin semantics)."""
    from vector_spark.datapipe.packing import pack_sequences, sequence_stats

    df = spark.createDataFrame(
        [
            (1, "a b c"),          # 3 tokens, offset 0,  seq 0
            (2, "d e f g"),        # 4 tokens, offset 3,  seq 0
            (3, "h i j k l m n"),  # 7 tokens, offset 7,  seq 0 (straddles)
            (4, "o p"),            # 2 tokens, offset 14, seq 1
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["token_offset"], r["seq_id"],
                      r["seq_offset"])
        for r in pack_sequences(df, budget=8).collect()
    }
    assert got == {
        1: (3, 0, 0, 0),
        2: (4, 3, 0, 3),
        3: (7, 7, 0, 7),
        4: (2, 14, 1, 6),
    }
    stats = {r["seq_id"]: (r["n_docs"], r["anchored_tokens"])
             for r in sequence_stats(pack_sequences(df, budget=8)).collect()}
    assert stats == {0: (3, 14), 1: (1, 2)}


def test_pack_sequences_partitioning_independent(spark):
    """The packing is defined by (id order, token counts) alone: any
    bucket count — including one that forces many tiny buckets — and
    any input partitioning must produce identical assignments."""
    from vector_spark.datapipe.packing import pack_sequences

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    base = sorted(
        map(tuple, pack_sequences(docs, budget=512).collect())
    )
    alt = sorted(
        map(
            tuple,
            pack_sequences(
                docs.repartition(7), budget=512, n_buckets=3
            ).collect(),
        )
    )
    assert base == alt


def test_pack_sequences_plan_has_no_global_window(spark):
    """The prefix sum must never route the corpus through one task:
    the cumsum window is partitioned by bucket, so the packed output's
    plan contains no SinglePartition exchange."""
    from vector_spark.datapipe.packing import pack_sequences

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = (
        pack_sequences(docs, budget=512)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_normalize_unicode_canonicalizes_before_hashing(spark):
    """NFKC: composed vs decomposed accents and full-width forms hash
    identically after normalization (the multilingual dedup pre-pass)."""
    from vector_spark.datapipe.dedup import portable_hash60
    from vector_spark.datapipe.text import normalize_unicode

    import pytest as _pytest

    df = spark.createDataFrame(
        [
            (1, "café latte"),            # é composed
            (2, "café latte"),           # e + combining acute
            (3, "ＣＡＦＥ"),   # full-width CAFE
        ],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id",
        portable_hash60(normalize_unicode(F.col("text"))).alias("h"),
        normalize_unicode(F.col("text")).alias("norm"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["h"] == by_id[2]["h"]
    assert by_id[3]["norm"] == "CAFE"
    with _pytest.raises(ValueError, match="unknown normalization form"):
        normalize_unicode(F.col("text"), form="NFX")


# ---------------------------------------------------------------------------
# connected components / duplicate clusters


def test_connected_components_chain_and_islands(spark):
    from vector_spark.datapipe.dedup import connected_components

    # chain 1-2-3-4 (diameter 3, exercises multi-round propagation),
    # island {10, 11}, and a clique {20, 21, 22}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["id_a", "id_b"],
    )
    got = {
        (r["id"], r["cluster_id"])
        for r in connected_components(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_connected_components_long_chain_converges(spark):
    from vector_spark.datapipe.dedup import connected_components

    # 30-node path: worst-case diameter for min-label propagation;
    # must converge (max_iter default 25 > needed rounds because the
    # min label travels 1 hop per round from node 0)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(29)], ["id_a", "id_b"]
    )
    rows = connected_components(pairs, max_iter=35).collect()
    assert {r["cluster_id"] for r in rows} == {0}
    assert len(rows) == 30


def test_connected_components_beats_kill_higher_id(spark):
    """The motivating case: A~B, B~C but NOT A~C.  Kill-higher-id
    deletes B and C (keeps 1 of 3); clustering keeps one rep per
    GROUP (here: one, since all three are one component) — but the
    point is the grouping is transitive and explicit."""
    from vector_spark.datapipe.dedup import connected_components

    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    comp = connected_components(pairs)
    reps = comp.filter(F.col("id") == F.col("cluster_id")).collect()
    assert [(r["id"], r["cluster_id"]) for r in reps] == [(1, 1)]


def test_dup_clusters_groups_planted_duplicates(spark):
    from vector_spark.datapipe.dedup import dup_clusters

    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [
        (1, base), (2, base), (3, base + "tail tweak"),   # one group
        (4, "completely different text about spark " * 6),
        (5, "completely different text about spark " * 6),  # second group
        (6, "a lone unique document with its own words entirely"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    comp = {r["doc_id"]: r["cluster_id"]
            for r in dup_clusters(df, threshold=0.5).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[4] == comp[5] == 4
    assert 6 not in comp  # singletons never enter the pair list


# ---------------------------------------------------------------------------
# int8 scalar quantization


def test_sq8_codes_bounded_and_max_hits_127(spark):
    from vector_spark.datapipe.similarity import sq8_quantize

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    out = df.select("vec_id", sq8_quantize(F.col("embedding")).alias("q")).collect()
    q = {r["vec_id"]: r["q"] for r in out}
    # maxabs element quantizes to ±127; everything within [-127, 127]
    assert q[1] == [64, -127, 32, 0]  # floor(0.5*127+0.5)=64, floor(0.25*127+0.5)=32
    assert q[2] == [0, 0, 0, 0]  # zero vector guarded, no div-by-zero


def test_sq8_topk_recall_vs_exact(spark):
    from vector_spark.datapipe.similarity import cosine_topk, sq8_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, k=10)
    approx = sq8_topk(emb, queries, k=10)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    # int8 quantization should preserve nearly all of the top-10 set
    assert len(e & a) / len(e) >= 0.9


def test_connected_components_raises_past_max_iter(spark):
    import pytest as _pytest

    from vector_spark.datapipe.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], ["id_a", "id_b"]
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2)


# ---------------------------------------------------------------------------
# training-mix sampling: temperature rebalancing + token quotas


def test_temperature_rates_uniform_groups_keep_target_frac(spark):
    from vector_spark.datapipe.sampling import temperature_rates

    # equal-size groups: every group's keep rate must equal target_frac
    # regardless of alpha (w_i/Σw = 1/G exactly)
    rows = [(i, f"g{i % 4}") for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "g"])
    for alpha in (0.0, 0.5, 1.0):
        rates = temperature_rates(df, "g", alpha=alpha, target_frac=0.6)
        assert {r["keep_thr"] for r in rates.collect()} == {600}


def test_temperature_rates_flatten_dominant_group(spark):
    from vector_spark.datapipe.sampling import temperature_rates

    # 900 vs 100 rows: alpha=1 keeps natural proportions (both thr =
    # target); alpha=0 aims at equal row counts per group (rare group
    # saturates at keep-all); alpha=0.5 sits between
    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "g"])
    thr = lambda a: {
        r["g"]: r["keep_thr"]
        for r in temperature_rates(df, "g", alpha=a, target_frac=0.5).collect()
    }
    t1 = thr(1.0)
    assert t1["big"] == t1["small"] == 500
    t0 = thr(0.0)
    assert t0["small"] == 1000  # capped at keep-all
    assert t0["big"] == round(250 / 900 * 1000)  # 250 target rows
    th = thr(0.5)
    assert t0["big"] < th["big"] < t1["big"]
    assert th["small"] > th["big"]


def test_temperature_mix_is_deterministic_subset(spark):
    from vector_spark.datapipe.sampling import temperature_mix

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = {r["doc_id"] for r in
         temperature_mix(docs, "lang").select("doc_id").collect()}
    b = {r["doc_id"] for r in
         temperature_mix(docs, "lang").select("doc_id").collect()}
    assert a == b and a  # same docs every run
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert a <= all_ids


def test_temperature_mix_broadcasts_rates(spark):
    from vector_spark.datapipe.sampling import temperature_mix

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        temperature_mix(docs, "lang")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_quota_sample_exact_budget_and_straddle(spark):
    from vector_spark.datapipe.sampling import quota_sample

    # every doc 5 tokens, budget 11 → offsets 0,5,10 pass (<11), the
    # third doc straddles; exactly 3 docs / 15 tokens kept per group
    rows = [(i, "x", f"g{i % 2}", 5) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "g", "nt"])
    kept = quota_sample(df, group_col="g", budget=11, token_col="nt")
    got = kept.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("t"),
        F.max("token_offset").alias("mo"),
    ).collect()
    assert len(got) == 2
    for r in got:
        assert (r["n"], r["t"], r["mo"]) == (3, 15, 10)


def test_quota_sample_bucketing_is_invisible(spark):
    from vector_spark.datapipe.sampling import quota_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pick = lambda bits: sorted(
        (r["doc_id"], r["token_offset"])
        for r in quota_sample(
            docs, group_col="lang", budget=500, n_bucket_bits=bits
        ).collect()
    )
    assert pick(1) == pick(6)  # 2 buckets vs 64: same result


def test_quota_sample_null_group_excluded(spark):
    from vector_spark.datapipe.sampling import quota_sample

    df = spark.createDataFrame(
        [(1, "a b c", "g"), (2, "d e f", None)], ["doc_id", "text", "g"]
    )
    kept = quota_sample(df, group_col="g", budget=100)
    assert [r["doc_id"] for r in kept.collect()] == [1]


def test_quota_sample_no_global_window(spark):
    """The per-group prefix sum must never funnel a group through a
    single partition: no Exchange SinglePartition in the plan."""
    from vector_spark.datapipe.sampling import quota_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    kept = quota_sample(docs, group_col="lang", budget=500)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


# ---------------------------------------------------------------------------
# deterministic splits + corpus boilerplate


def test_hash_split_fractions_and_determinism(spark):
    from vector_spark.datapipe.sampling import hash_split

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    n = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / n - 0.8) < 0.05
    # same assignment on a second evaluation
    again = {r["split"]: r["n"] for r in
             hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
             .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == again


def test_hash_split_group_is_leak_free(spark):
    from vector_spark.datapipe.sampling import hash_split

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = hash_split(docs, {"a": 0.5, "b": 0.5}, group_col="source")
    per_group = out.groupBy("source").agg(
        F.countDistinct("split").alias("k")
    ).collect()
    assert per_group and all(r["k"] == 1 for r in per_group)


def test_hash_split_salt_changes_assignment_and_validates(spark):
    import pytest as _pytest
    from vector_spark.datapipe.sampling import hash_split

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    a = {r["doc_id"]: r["split"]
         for r in hash_split(docs, {"x": 0.5, "y": 0.5}).collect()}
    b = {r["doc_id"]: r["split"]
         for r in hash_split(docs, {"x": 0.5, "y": 0.5}, salt="v2").collect()}
    assert a != b
    with _pytest.raises(ValueError):
        hash_split(docs, {})
    with _pytest.raises(ValueError):
        hash_split(docs, {"x": -1.0, "y": 2.0})
    with _pytest.raises(ValueError):
        hash_split(docs, {"x": 0.0})


def test_hash_split_is_narrow(spark):
    from vector_spark.datapipe.sampling import hash_split

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        hash_split(docs, {"train": 0.9, "test": 0.1})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure map over the scan


def test_boilerplate_metrics_hand_case(spark):
    from vector_spark.datapipe.text import boilerplate_metrics

    # 10 identical 5-word docs (one gram each, df=10/13 > 1%), two
    # unique long docs, one doc too short for any 5-gram
    rows = (
        [(i, "the cat sat on mat") for i in range(10)]
        + [(20, "alpha beta gamma delta epsilon zeta eta"),
           (21, "one two three four five six seven eight"),
           (22, "too short")]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           boilerplate_metrics(df, n=5, min_doc_frac=0.5, flag_frac=0.3)
           .collect()}
    assert len(got) == 13
    for i in range(10):
        r = got[i]
        assert (r["n_grams"], r["boiler_hits"], r["boiler_frac"],
                r["is_boilerplate"]) == (1, 1, 1.0, True)
    for i in (20, 21):
        assert got[i]["boiler_hits"] == 0 and not got[i]["is_boilerplate"]
    assert got[22]["n_grams"] == 0 and got[22]["boiler_frac"] == 0.0
    assert not got[22]["is_boilerplate"]


def test_boilerplate_flag_boundary_is_exact(spark):
    from vector_spark.datapipe.text import boilerplate_metrics

    # the frequent gram is the self-overlapping "p p p p p"; a run of
    # k p's contributes k-4 hits.  doc 98: 7 p's + 7 fillers = 14
    # words → 10 grams, 3 hits — exactly 3/10, which is NOT > 0.3
    # (integer compare 3*10 > 10*3 is false: ties stay unflagged).
    # doc 99: 8 p's + 6 fillers = 14 words → 10 grams, 4 hits → 0.4,
    # flagged.  An off-by-one regression to >= would flip doc 98.
    p5 = "p p p p p"
    rows = (
        [(i, p5) for i in range(50)]
        + [(98, f"{p5} p p u1 u2 u3 u4 u5 u6 u7"),
           (99, f"{p5} p p p u1 u2 u3 u4 u5 u6")]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {x["doc_id"]: x for x in
           boilerplate_metrics(df, n=5, min_doc_frac=0.5, flag_frac=0.3)
           .collect()}
    r98, r99 = got[98], got[99]
    assert (r98["n_grams"], r98["boiler_hits"]) == (10, 3)
    assert not r98["is_boilerplate"]
    assert (r99["n_grams"], r99["boiler_hits"]) == (10, 4)
    assert r99["is_boilerplate"]


def test_boilerplate_broadcasts_frequent_set(spark):
    from vector_spark.datapipe.text import boilerplate_metrics

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        boilerplate_metrics(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# CCNet-style perplexity scoring + bucketing


def test_unigram_lm_and_scores_hand_case(spark):
    import math

    from vector_spark.datapipe.lm import perplexity_scores, unigram_lm

    ref = spark.createDataFrame([(0, "a a b")], ["doc_id", "text"])
    lm = unigram_lm(ref, alpha=0.5)
    # T=3 tokens, V=2 types, denom = 3 + 0.5*(2+1) = 4.5
    got = {r["token_h"]: r["logp"] for r in lm.collect()}
    assert len(got) == 3 and None in got
    assert math.isclose(got[None], math.log(0.5 / 4.5))
    assert sorted(v for k, v in got.items() if k is not None) == sorted(
        [math.log(2.5 / 4.5), math.log(1.5 / 4.5)]
    )

    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, None)], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in perplexity_scores(df, lm).collect()}
    exp = -(
        math.log(2.5 / 4.5) + math.log(1.5 / 4.5) + math.log(0.5 / 4.5)
    ) / 3
    assert rows[1]["n_tokens"] == 3
    assert rows[1]["nll_milli"] == round(exp * 1000)
    for i in (2, 3):  # empty and NULL text: nothing to score
        assert rows[i]["n_tokens"] == 0 and rows[i]["nll_milli"] is None


def test_ccnet_buckets_hand_case_and_ties(spark):
    import pytest as _pytest
    from vector_spark.datapipe.lm import ccnet_buckets

    df = spark.createDataFrame(
        [(i, "g", i) for i in range(1, 10)], ["doc_id", "g", "nll_milli"]
    )
    got = {r["doc_id"]: r["bucket"] for r in
           ccnet_buckets(df, group_col="g").collect()}
    assert all(got[i] == "head" for i in (1, 2, 3))
    assert all(got[i] == "middle" for i in (4, 5, 6))
    assert all(got[i] == "tail" for i in (7, 8, 9))

    # every score identical → the tie rule sends ALL rows to head
    ties = spark.createDataFrame(
        [(i, "g", 7) for i in range(4)], ["doc_id", "g", "nll_milli"]
    )
    assert {r["bucket"] for r in ccnet_buckets(ties, group_col="g").collect()} \
        == {"head"}

    # NULL score passes through with a NULL bucket
    withnull = spark.createDataFrame(
        [(0, "g", 1), (1, "g", None)], ["doc_id", "g", "nll_milli"]
    )
    got = {r["doc_id"]: r["bucket"] for r in
           ccnet_buckets(withnull, group_col="g").collect()}
    assert got[1] is None and got[0] == "head"

    with _pytest.raises(ValueError):
        ccnet_buckets(df, group_col="g", fracs=(0.9, 0.5))


def test_ccnet_buckets_partitioning_independent(spark):
    from vector_spark.datapipe.lm import ccnet_buckets

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang", (F.col("n_chars") % 97).alias("nll_milli")
    )
    pick = lambda d: sorted(
        (r["doc_id"], r["bucket"]) for r in
        ccnet_buckets(d, group_col="lang").collect()
    )
    assert pick(docs) == pick(docs.repartition(7))


def test_ccnet_thresholds_are_broadcast(spark):
    from vector_spark.datapipe.lm import (
        ccnet_buckets, perplexity_scores, unigram_lm,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    lm = unigram_lm(docs.filter(F.col("doc_id") % 5 == 0))
    scored = perplexity_scores(docs, lm).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    plan = (
        ccnet_buckets(scored, group_col="lang")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the only SinglePartition exchanges are the one-row LM totals
    # (map-side partials, tiny final agg); the cumulative window must
    # always partition by the group — a global window here would pull
    # the histogram of EVERY language through one task
    for line in plan.splitlines():
        if line.lstrip().startswith("+- Window ") or " Window [" in line:
            assert "], [], [" not in line, f"global window: {line}"
    assert "windowspecdefinition(lang" in plan


# ---------------------------------------------------------------------------
# NULL-group / NULL-unit semantics (review regressions)


def test_quota_sample_all_null_groups_returns_empty(spark):
    from vector_spark.datapipe.sampling import quota_sample

    df = spark.createDataFrame(
        [(1, "a b c", None), (2, "d e f", None)],
        "doc_id: long, text: string, g: string",
    )
    assert quota_sample(df, group_col="g", budget=100).count() == 0


def test_temperature_mix_null_group_mass_excluded(spark):
    from vector_spark.datapipe.sampling import temperature_mix, temperature_rates

    # 200 real rows + 200 NULL-group rows: the NULL slice must not
    # consume target mass — the kept fraction OF THE REAL ROWS stays
    # at target_frac (not target_frac/2), and rates has no NULL row
    rows = [(i, "g1" if i % 2 == 0 else None) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id: long, g: string")
    rates = temperature_rates(df, "g", alpha=0.5, target_frac=0.6).collect()
    assert [r["g"] for r in rates] == ["g1"]
    assert rates[0]["keep_thr"] == 600
    kept = temperature_mix(df, "g", alpha=0.5, target_frac=0.6)
    assert kept.filter(F.col("g").isNull()).count() == 0
    frac = kept.count() / 200
    assert abs(frac - 0.6) < 0.15


def test_hash_split_null_unit_gets_null_split(spark):
    from vector_spark.datapipe.sampling import hash_split

    df = spark.createDataFrame(
        [(1, "s1"), (2, None), (3, None)], "doc_id: long, src: string"
    )
    got = {r["doc_id"]: r["split"] for r in
           hash_split(df, {"a": 0.5, "b": 0.5}, group_col="src").collect()}
    assert got[1] in ("a", "b")
    assert got[2] is None and got[3] is None


def test_ccnet_null_group_buckets_null_not_tail(spark):
    from vector_spark.datapipe.lm import ccnet_buckets

    df = spark.createDataFrame(
        [(0, "g", 1), (1, "g", 2), (2, "g", 3), (3, None, 1)],
        "doc_id: long, g: string, nll_milli: long",
    )
    got = {r["doc_id"]: r["bucket"] for r in
           ccnet_buckets(df, group_col="g").collect()}
    assert got[3] is None  # best score, missing group: NOT 'tail'
    assert got[0] == "head" and got[2] == "tail"


def test_pack_sequences_matches_shared_prefix_helper(spark):
    # packing semantics unchanged after the bucketed_prefix_sum
    # refactor: hand-computed offsets incl. a straddling doc
    from vector_spark.datapipe.packing import pack_sequences

    rows = [(1, 5), (2, 5), (3, 4), (4, 9)]  # budget 7: doc 2 straddles
    df = spark.createDataFrame(rows, "doc_id: long, nt: long")
    got = {r["doc_id"]: (r["token_offset"], r["seq_id"], r["seq_offset"])
           for r in pack_sequences(df, budget=7, token_col="nt").collect()}
    assert got == {1: (0, 0, 0), 2: (5, 0, 5), 3: (10, 1, 3), 4: (14, 2, 0)}


# ---------------------------------------------------------------------------
# NB log-odds classifier + top-k-per-group selection + DSIR


def test_nb_logodds_weights_hand_case(spark):
    import math

    from vector_spark.datapipe.classify import (
        classifier_scores, nb_logodds_weights,
    )

    labeled = spark.createDataFrame(
        [(True, "a a b"), (False, "b c")], ["label", "text"]
    )
    w = nb_logodds_weights(labeled, alpha=0.5)
    # vocab {a,b,c}: V=3, Tp=3, Tn=2; denom_p=3+0.5*4=5, denom_n=2+0.5*4=4
    def m(cp, cn):
        return round(
            (math.log((cp + 0.5) / 5.0) - math.log((cn + 0.5) / 4.0)) * 1000
        )

    rows = w.collect()
    assert len(rows) == 4  # 3 vocab + 1 OOV sentinel
    oov = [r for r in rows if r["token_h"] is None]
    assert len(oov) == 1 and oov[0]["w_milli"] == m(-0.5 + 0.5, -0.5 + 0.5)
    assert sorted(r["w_milli"] for r in rows if r["token_h"] is not None) == (
        sorted([m(2, 0), m(1, 1), m(0, 1)])
    )

    docs = spark.createDataFrame(
        [(1, "a"), (2, "a a"), (3, "zz"), (4, "")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in classifier_scores(docs, w).collect()}
    assert got[1]["score_milli"] == m(2, 0) and got[1]["keep"] is True
    # occurrences weight naturally: "a a" doubles the single-token score
    assert got[2]["score_milli"] == 2 * m(2, 0)
    # unknown token takes the OOV weight; ln(1/10)-ln(1/8) < 0 -> drop
    assert got[3]["score_milli"] == m(-0.5 + 0.5, -0.5 + 0.5)
    assert got[3]["keep"] is False
    # zero tokens: nothing measured, keep undecided (NULL), not dropped
    assert got[4]["n_tokens"] == 0
    assert got[4]["score_milli"] is None and got[4]["keep"] is None


def test_topk_per_group_threshold_ties_and_short_groups(spark):
    import pytest as _pytest

    from vector_spark.datapipe.classify import topk_per_group

    rows = [
        # g1: scores 5,4,4,4,1 — k=2 threshold is 4; the three ties
        # at 4 all survive phase 1, rank breaks them by id ASC
        ("g1", 10, 5), ("g1", 13, 4), ("g1", 11, 4), ("g1", 12, 4),
        ("g1", 14, 1),
        # g2: fewer than k rows -> threshold NULL -> keep all
        ("g2", 20, 7),
        # excluded pass-outs: NULL score / NULL group
        ("g1", 15, None), (None, 16, 9),
    ]
    df = spark.createDataFrame(
        rows, "source string, doc_id long, score_milli long"
    )
    got = sorted(
        (r["source"], r["doc_id"])
        for r in topk_per_group(df, 2, group_col="source").collect()
    )
    assert got == [("g1", 10), ("g1", 11), ("g2", 20)]
    with _pytest.raises(ValueError):
        topk_per_group(df, 0)


def test_topk_per_group_plan_thresholds_broadcast_no_global_window(spark):
    from vector_spark.datapipe.classify import topk_per_group

    df = spark.range(1000).select(
        (F.col("id") % 7).cast("string").alias("source"),
        F.col("id").alias("doc_id"),
        (F.col("id") % 101).alias("score_milli"),
    )
    plan = (
        topk_per_group(df, 5, group_col="source")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan  # per-group thresholds broadcast
    assert "CartesianProduct" not in plan
    # both windows (histogram cum + final rank) partition by the
    # group — a global window would funnel everything through one task
    assert "windowspecdefinition(source" in plan
    for line in plan.splitlines():
        if " Window [" in line or line.lstrip().startswith("+- Window "):
            assert "], [], [" not in line, f"global window: {line}"


def test_dsir_logratio_hand_case(spark):
    import math

    from vector_spark.datapipe.lm import dsir_logratio, unigram_lm

    target = spark.createDataFrame([(0, "a a b")], ["doc_id", "text"])
    raw = spark.createDataFrame([(0, "a b c")], ["doc_id", "text"])
    t_lm = unigram_lm(target)  # T=3,V=2: denom 4.5
    r_lm = unigram_lm(raw)     # T=3,V=3: denom 5.0
    docs = spark.createDataFrame(
        [(1, "a c"), (2, "")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r for r in dsir_logratio(docs, t_lm, r_lm).collect()
    }
    d_a = round((math.log(2.5 / 4.5) - math.log(1.5 / 5.0)) * 1000)
    # 'c' is OOV for the target LM but in-vocab for the raw LM
    d_c = round((math.log(0.5 / 4.5) - math.log(1.5 / 5.0)) * 1000)
    assert got[1]["n_tokens"] == 2
    assert got[1]["logratio_milli"] == d_a + d_c
    assert got[2]["n_tokens"] == 0 and got[2]["logratio_milli"] is None


def test_classifier_plan_broadcasts_weights(spark):
    from vector_spark.datapipe.classify import (
        classifier_scores, nb_logodds_weights,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    seed = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "label", F.col("lang") == "en"
    )
    plan = (
        classifier_scores(docs, nb_logodds_weights(seed, label_col="label"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the token-level weights join — the corpus-sized side — must be
    # broadcast; the only shuffle join allowed is the final per-doc
    # re-join on doc_id that restores zero-token docs (same shape as
    # lm.perplexity_scores)
    assert "BroadcastHashJoin [token_h" in plan
    assert plan.count("SortMergeJoin") <= 1
    assert "SortMergeJoin [token_h" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# Product quantization (ADC + exact refine)


def test_pq_codebooks_deterministic_and_encode_shape(spark):
    from vector_spark.datapipe.similarity import (
        pq_encode, pq_train_codebooks,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    b1 = pq_train_codebooks(emb, m=8, ksub=16, iters=3)
    b2 = pq_train_codebooks(emb, m=8, ksub=16, iters=3)
    assert b1 == b2  # fixed seed + deterministic sample ordering
    assert len(b1) == 8 and len(b1[0]) == 16 and len(b1[0][0]) == 8

    coded = pq_encode(emb, b1)
    row = coded.select("pq_codes").first()
    assert len(row["pq_codes"]) == 8
    assert all(0 <= c < 16 for c in row["pq_codes"])
    # encoding is a pure function: re-encoding matches itself
    a = {r["vec_id"]: r["pq_codes"] for r in coded.collect()}
    b = {r["vec_id"]: r["pq_codes"] for r in pq_encode(emb, b1).collect()}
    assert a == b

    import pytest as _pytest
    with _pytest.raises(ValueError):
        pq_train_codebooks(emb, m=7)  # 64 % 7 != 0


def test_pq_recall_vs_exact(spark):
    from vector_spark.datapipe.similarity import pq_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=10).collect()
    # measured on this corpus (numpy prototype, 32 queries):
    # m=16/ksub=16/refine=50 → 0.887; m=8/ksub=32/refine=100 → 0.922
    approx = pq_topk(emb, queries, k=10, m=16, ksub=16, refine=50).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.8, f"PQ refine-recall {recall} too low (16x16, R=50)"
    # the refine stage outputs exactly k rows per query
    assert len(approx_set) == len(exact_set)


def test_pq_encode_plan_is_narrow(spark):
    from vector_spark.datapipe.similarity import (
        pq_encode, pq_train_codebooks,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    books = pq_train_codebooks(emb, m=8, ksub=16, iters=2)
    plan = (
        pq_encode(emb, books)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the O(N) encode is a pure projection (zero exchanges) through
    # the Arrow batch seam — never row-at-a-time Python
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_nb_weights_ignore_null_labels(spark):
    from vector_spark.datapipe.classify import nb_logodds_weights

    labeled = spark.createDataFrame(
        [(True, "a a b"), (False, "b c"), (None, "q q q")],
        "label boolean, text string",
    )
    clean = spark.createDataFrame(
        [(True, "a a b"), (False, "b c")], "label boolean, text string"
    )
    got = sorted(
        (r["token_h"] or -1, r["w_milli"])
        for r in nb_logodds_weights(labeled).collect()
    )
    want = sorted(
        (r["token_h"] or -1, r["w_milli"])
        for r in nb_logodds_weights(clean).collect()
    )
    # NULL-labeled rows contribute to neither class nor the vocabulary
    assert got == want and len(got) == 4


def test_pq_topk_refine_floored_at_k(spark):
    from vector_spark.datapipe.similarity import pq_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(100)
    queries = emb.filter(F.col("vec_id") < 2)
    out = pq_topk(emb, queries, k=10, m=8, ksub=16, refine=1)
    counts = {r["query_id"]: r["n"] for r in
              out.groupBy("query_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(n == 10 for n in counts.values()), counts


def test_ivfpq_recall_vs_exact(spark):
    from vector_spark.datapipe.similarity import pq_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=10).collect()
    approx = pq_topk(
        emb, queries, k=10, m=16, ksub=16, refine=100,
        n_lists=8, n_probe=6,
    ).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.8, f"IVF-PQ recall {recall} too low (8 lists/6 probe)"
    # exactly one row per (query, rank): the multi-probe join must not
    # duplicate shortlist rows into the rescore
    keys = [(r["query_id"], r["rank"]) for r in approx]
    assert len(keys) == len(set(keys)) == 20 * 10
    neighbors = [(r["query_id"], r["neighbor_id"]) for r in approx]
    assert len(neighbors) == len(set(neighbors))


def test_multiclass_grader_recovers_grades(spark):
    """A corpus where each grade has its own marker vocabulary: the
    grader must recover every held-out doc's grade, and ties/priors
    must stay deterministic."""
    from vector_spark.datapipe.classify import (
        grade_documents, nb_multiclass_weights,
    )

    rows = []
    for k in range(4):
        marker = f"marker{k} quality{k} level{k}"
        for i in range(12):
            rows.append((k * 100 + i, f"{marker} common filler text", k))
    seed = spark.createDataFrame(rows, "doc_id long, text string, label int")
    weights, classes = nb_multiclass_weights(seed)
    heldout = spark.createDataFrame(
        [
            (1000, "marker0 quality0 something common"),
            (1001, "level1 marker1 filler"),
            (1002, "quality2 quality2 text"),
            (1003, "marker3 level3 quality3"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["grade"]
        for r in grade_documents(heldout, weights, classes).collect()
    }
    assert got == {1000: 0, 1001: 1, 1002: 2, 1003: 3}


def test_multiclass_grader_null_label_and_oov_docs(spark):
    """NULL seed labels are ignored; a doc with zero vocab hits still
    grades (prior + n * oov fallback rows); zero-token docs drop."""
    from vector_spark.datapipe.classify import (
        grade_documents, nb_multiclass_weights,
    )

    seed = spark.createDataFrame(
        [
            (1, "alpha alpha beta", 0),
            (2, "gamma gamma delta", 1),
            (3, "poison poison poison", None),
        ],
        "doc_id long, text string, label int",
    )
    weights, classes = nb_multiclass_weights(seed)
    # the NULL-labeled doc's vocabulary must not exist in the model
    vocab_hashes = {r["token_h"] for r in weights.collect()}
    from vector_spark.datapipe.langid import _hash60_py

    assert _hash60_py("poison") not in vocab_hashes
    docs = spark.createDataFrame(
        [(10, "alpha beta"), (11, "zzz yyy xxx"), (12, "   ")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r for r in grade_documents(docs, weights, classes).collect()
    }
    assert got[10]["grade"] == 0
    # no-hit doc: argmax of prior + n*oov — equal priors and oovs here,
    # tie breaks to the smallest label
    assert got[11]["grade"] == 0 and got[11]["n_tokens"] == 3
    assert 12 not in got, "zero-token docs are excluded"


def test_diversity_sample_balance_and_determinism(spark):
    from vector_spark.datapipe.similarity import (
        anchor_assign, diversity_sample,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    picked = diversity_sample(emb, n_anchors=4, per_cluster=25)
    rows = picked.collect()
    per = {}
    for r in rows:
        per[r["anchor_id"]] = per.get(r["anchor_id"], 0) + 1
    # quota respected per region; no region exceeds the cap
    assert all(n <= 25 for n in per.values()), per
    assert len(per) == 4  # anchors are the 4 lowest ids -> 4 regions
    # deterministic under repartitioning (pure function of the data)
    again = diversity_sample(
        emb.repartition(13), n_anchors=4, per_cluster=25
    ).collect()
    assert sorted((r["vec_id"], r["anchor_id"]) for r in rows) == sorted(
        (r["vec_id"], r["anchor_id"]) for r in again
    )
    # every vector assigns to its true rounded-cosine argmax
    anchors = emb.orderBy("vec_id").limit(4)
    asn = anchor_assign(emb, anchors)
    joined = asn.groupBy().agg(F.count(F.lit(1)).alias("n")).collect()
    assert joined[0]["n"] == emb.count()


def test_chunk_documents_edges(spark):
    from pyspark.sql import Row

    from vector_spark.datapipe.text import chunk_documents

    df = spark.createDataFrame([
        Row(doc_id=1, text=" ".join(f"w{i}" for i in range(10))),   # 1 chunk
        Row(doc_id=2, text=" ".join(f"w{i}" for i in range(64))),   # exact
        Row(doc_id=3, text=" ".join(f"w{i}" for i in range(65))),   # +1 tail
        Row(doc_id=4, text=" ".join(f"w{i}" for i in range(200))),
        Row(doc_id=5, text="   "),                                   # empty
    ])
    out = chunk_documents(df, chunk_tokens=64, overlap=16)
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_n_tokens"], r["n_chunks"])
        for r in out.collect()
    )
    by_doc = {}
    for d, i, nt, nc in rows:
        by_doc.setdefault(d, []).append((i, nt, nc))
    assert by_doc[1] == [(0, 10, 1)]
    assert by_doc[2] == [(0, 64, 1)]
    # 65 tokens, stride 48: windows at 0 (64) and 48 (17)
    assert by_doc[3] == [(0, 64, 2), (1, 17, 2)]
    # 200 tokens: starts 0,48,96,144 -> 64,64,64,56
    assert by_doc[4] == [(0, 64, 4), (1, 64, 4), (2, 64, 4), (3, 56, 4)]
    assert 5 not in by_doc
    # overlap invariant: consecutive chunks share exactly `overlap`
    # tokens (except the tail, which shares at least 1)
    c4 = {r["chunk_idx"]: r["chunk_text"].split(" ")
          for r in out.where(F.col("doc_id") == 4).collect()}
    assert c4[0][-16:] == c4[1][:16]
    assert c4[1][-16:] == c4[2][:16]
    # determinism under repartition
    again = chunk_documents(df.repartition(7), chunk_tokens=64, overlap=16)
    assert sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_n_tokens"], r["n_chunks"])
        for r in again.collect()
    ) == rows
