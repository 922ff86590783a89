"""Physical-plan quality gates: the plans we ship are the plans we
mean.  Catches regressions where a filter stops pushing down, a
broadcast silently becomes a sort-merge join, or an extra shuffle
appears (at 100 TB each of these is the difference between a job that
finishes and one that doesn't)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.data.transcripts import transcripts_table
from vector_spark.plans.transcript_pipeline import (
    enriched_transcripts,
    pipeline_stats,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_to_parquet(spark):
    t = transcripts_table(spark, 6000)
    df = t.filter(F.col("conv_id") == "conv-00000001").select("conv_id", "turn_idx")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(conv_id), EqualTo(conv_id,conv-00000001)" in plan


def test_column_pruning(spark):
    t = transcripts_table(spark, 6000)
    plan = _plan(t.select("conv_id", "turn_idx"))
    # scan must not read the wide text column for a 2-column projection
    assert "ReadSchema: struct<conv_id:string,turn_idx:int>" in plan


def test_enrich_is_broadcast_join(spark):
    out, _ = enriched_transcripts(spark, transcripts_table(spark, 6000))
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pipeline_stats_shuffle_budget(spark):
    df = pipeline_stats(spark, transcripts_table(spark, 6000))
    plan = _plan(df)
    # two exchanges exactly: the two-phase exact-distinct aggregation
    # (partial on (sink, window, conv_id), final on (sink, window));
    # parse, enrich (broadcast) and explode are all narrow
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 2, f"expected 2 shuffles, plan has {n_exchanges}"
    assert "Exchange hashpartitioning(sink" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_parse_scan_is_columnar(spark):
    """from_csv/from_json are CodegenFallback expressions, so the parse
    projection itself runs outside whole-stage codegen — but the scan
    underneath must stay columnar-batched and prune to (conv_id, text),
    and non-parse plans keep codegen."""
    from vector_spark.functions.parse import parse_transcripts

    t = transcripts_table(spark, 6000)
    df = parse_transcripts(t).select("conv_id", "parsed.http_status")
    plan = _plan(df)
    assert "ColumnarToRow" in plan and "Batched: true" in plan
    import re
    assert re.search(r"FileScan parquet \[conv_id#\d+,text#\d+\]", plan)
    assert _plan(t.filter("turn_idx > 3")).startswith("*(")  # codegen marker


def test_tag_cardinality_acceptance_set_is_parallel(spark):
    """The first-seen acceptance ranking must be a TakeOrderedAndProject
    (per-partition top-K), never a global-window row_number whose
    single-partition Exchange is exactly what blows up under the
    tag-cardinality explosion this operator guards against."""
    from vector_spark.operators.metrics import tag_cardinality_limit

    t = transcripts_table(spark, 6000)
    df = tag_cardinality_limit(t, ["role"], value_limit=3)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan
    assert "Window" not in plan


def test_near_dup_pairs_has_no_cross_join(spark):
    """The near-dup scale path must be bucket equi-joins only — the
    all-pairs cross join was round 1's scale-killer."""
    from vector_spark.queries_datapipe import q_emb_near_dup

    plan = _plan(q_emb_near_dup(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_jaccard_candidate_restriction_below_pair_join(spark):
    """With LSH candidates, jaccard_pairs must semi-join the shingle
    table to candidate docs AND the collision rows to candidate pairs
    BEFORE the intersection groupBy — so LSH bounds the quadratic work
    (VERDICT r1 #4)."""
    from vector_spark.datapipe.dedup import (
        jaccard_pairs, lsh_candidates, minhash_signatures,
    )
    from vector_spark.queries_datapipe import _dup_df

    dup = _dup_df(spark, "/root/testdata/sf0.001")
    cand = lsh_candidates(minhash_signatures(dup))
    out = jaccard_pairs(dup, cand, threshold=0.5)
    optimized = out._jdf.queryExecution().optimizedPlan().toString()
    assert optimized.count("LeftSemi") >= 2
    # the pair-level semi join must sit under the intersection count:
    # the first Aggregate (from the top) appears only after... instead,
    # assert structurally: every Aggregate that computes the `inter`
    # count has a LeftSemi somewhere beneath it
    lines = optimized.splitlines()
    inter_idx = next(
        i for i, ln in enumerate(lines)
        if "Aggregate" in ln and "count(1) AS inter" in ln
    )
    assert any("LeftSemi" in ln for ln in lines[inter_idx:]), (
        "candidate semi-join not below the intersection aggregate"
    )


def test_parse_not_reevaluated_per_field(spark):
    """The parsed struct must appear ONCE in the optimized plan —
    repeated from_csv/from_json per extracted field was a 5x
    regression (see BASELINE.md scaling lessons)."""
    from vector_spark.functions.parse import parse_transcripts

    df = parse_transcripts(transcripts_table(spark, 6000)).select(
        "conv_id", "parsed.http_status", "parsed.http_bytes",
        "parsed.level", "parsed.latency_ms",
    )
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert optimized.count("from_csv") <= 1, "from_csv inlined per field"
    assert optimized.count("from_json") <= 1, "from_json inlined per field"


def test_sq8_topk_broadcasts_queries_only(spark):
    """The SQ8 scan path must broadcast the (tiny) query side and never
    shuffle the corpus: one BroadcastExchange, no SortMergeJoin, no
    Exchange other than the final top-k window's."""
    from vector_spark.datapipe.similarity import sq8_topk
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = sq8_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_langid_plan_broadcast_no_cartesian(spark):
    """predict_lang: the profile table must broadcast-join the exploded
    gram stream, with no cartesian product anywhere (the doc x language
    cross join is designed out via the hits-only candidate set)."""
    from vector_spark.datapipe.langid import predict_lang

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(predict_lang(docs))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quality_grades_plan_weights_broadcast(spark):
    """grade_documents: the dense vocab x class weight table
    broadcasts, nothing is a cartesian product, and the corpus-side
    tokenize/explode subtree is computed at most twice (n_tokens +
    hits) — the round-3 anti-join formulation recomputed it a third
    time for the no-hit fallback."""
    from vector_spark.datapipe.classify import (
        grade_documents, nb_multiclass_weights,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    seed = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "label", (F.expr("doc_id div 2") % 6).cast("int")
    )
    weights, classes = nb_multiclass_weights(seed)
    plan = _plan(grade_documents(docs, weights, classes))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the no-hit fallback must be the Column expression over collected
    # class constants, NOT an anti-join (which recomputed the whole
    # corpus tokenize+join+aggregate subtree a second time in r3)
    assert "LeftAnti" not in plan


def test_topk_per_group_no_full_group_window(spark):
    """topk_per_group: the coarse bucket pass must keep the raw-score
    stream out of any window — only (group, bucket) and in-bucket
    (group, score) histograms are windowed, never the ungrouped rows —
    and nothing lands in a single partition."""
    from vector_spark.datapipe.classify import topk_per_group

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scored = docs.select(
        "source", "doc_id", (F.col("doc_id") * 37 % 100003).alias("score_milli")
    )
    plan = _plan(
        topk_per_group(scored, 10, group_col="source",
                       score_col="score_milli", id_col="doc_id")
    )
    assert "SinglePartition" not in plan
    # every Window sits above an aggregate (histogram), so each window
    # input is pre-shrunk: exactly 3 window operators (coarse cum,
    # in-bucket cum, final row_number) — and the final rank compiles to
    # WindowGroupLimit (partial+final top-k pushdown), so even the
    # survivor set is rank-limited before the shuffle
    assert plan.count("Window [") == 3, plan.count("Window [")
    assert "WindowGroupLimit" in plan


def test_bloom_probe_is_broadcast_no_fact_shuffle(spark):
    """Bloom membership (operators/probabilistic.py): the fact side
    must never shuffle — the distinct-key verdict broadcasts back, and
    the bit table joins broadcast.  A SortMergeJoin against the probe
    frame would shuffle the 100 TB side."""
    from vector_spark.operators.probabilistic import (
        bloom_build,
        bloom_contains,
    )

    t = transcripts_table(spark, 6000)
    keys = t.filter(F.col("role") == "tool").select("conv_id").distinct()
    bits = bloom_build(keys, "conv_id", m_bits=1024, k=3)
    out = bloom_contains(t, bits, "conv_id", m_bits=1024, k=3)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cuckoo_windows_partition_by_bucket(spark):
    """Cuckoo placement ranks within buckets — the window exchanges
    must partition on the bucket columns, never SinglePartition (a
    global sort of the key set is the thing two-choice hashing
    avoids)."""
    from vector_spark.operators.probabilistic import cuckoo_build

    t = transcripts_table(spark, 6000)
    table = cuckoo_build(t, "conv_id", n_buckets=64, bucket_size=4)
    plan = _plan(table)
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_curation_e2e_no_cartesian_no_global_window(spark):
    """The composed curation chain keeps every stage's bounded shape:
    no cross join anywhere (LSH buckets, broadcast benchmark) and no
    single-partition exchange (the quota prefix sum stays bucketed)."""
    from vector_spark.queries_datapipe import q_doc_curation_e2e

    df = q_doc_curation_e2e(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan


def test_encode_roundtrip_queries_single_scan_no_shuffle(spark):
    """The codec round-trip queries (syslog/gelf/cef) are per-row
    encode→decode pipelines: one scan, zero exchanges — any Exchange
    here would mean an accidental aggregation or join in a map-only
    plan."""
    from vector_spark.queries import (
        q_gelf_encode_roundtrip,
        q_syslog_encode_roundtrip,
    )

    for fn in (q_syslog_encode_roundtrip, q_gelf_encode_roundtrip):
        plan = _plan(fn(spark, "/root/testdata/sf0.001"))
        assert "Exchange" not in plan, fn.__name__
        scans = plan.count("Scan parquet") + plan.count("Scan ExistingRDD")
        assert scans <= 1, (fn.__name__, scans)
