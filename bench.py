"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <pipeline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "turns_per_sec": ...,
   "cpus": N, "n_turns": N}

The headline metric is the full parse→enrich→route→aggregate pipeline
(all four sinks + unmatched + per-sink windowed aggregates), i.e. the
BASELINE.md anchor "regex parsing 13.2 MiB/s" re-expressed as turns/sec.
Run scaling_bench.py for the N-vs-4N-cores scaling-efficiency evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


#: loadavg when the run started — emitted in the JSON so
#: flat-within-noise rounds are self-evident (this host carries a
#: variable ~5 cores of background load; numbers recorded under load
#: are NOT comparable with clean-host runs)
_LOAD_START = os.getloadavg()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_override = os.environ.get("SPARK_GRAFT_BENCH_N")

    from vector_spark.session import get_spark
    from vector_spark.data.transcripts import (
        n_turns_for_sf_dir,
        transcripts_table,
    )

    n_for_sizing = int(n_override) if n_override else None
    shuffle_override = os.environ.get("SPARK_GRAFT_SHUFFLE")
    if shuffle_override:
        shuffle = int(shuffle_override)
    else:
        # size shuffle partitions to DATA, floored at core count: ~300k
        # turns (~50 MB) per partition keeps aggregation hash tables in
        # memory at any input size (at 19.2M turns, 8 partitions =
        # 2.4M rows each → spill → measured scaling fell to 0.53; with
        # data-sized partitions it recovers)
        from vector_spark.data.transcripts import n_turns_for_sf_dir as _n

        approx_n = n_for_sizing or _n(sf_dir)
        shuffle = max(cpus, 8, approx_n // 300_000)
    spark = get_spark("vector_spark_bench", master=f"local[{cpus}]",
                      shuffle_partitions=shuffle)
    # size SCAN partitions to data too: the parse stage is the CPU-heavy
    # leg, and the default 128MB maxPartitionBytes packs the cache files
    # into a task count near the core count — ragged waves (measured:
    # 10 scan tasks over 8 executors at 19.2M ran the pipeline at 0.58
    # scaling efficiency and 65% executor utilization; ~3 tasks/core
    # measured 36.6s vs 61.8s on the same leg).  ~100 B/turn.
    approx_n = n_for_sizing or n_turns_for_sf_dir(sf_dir)
    scan_bytes = min(128 * 2**20, max(4 * 2**20, approx_n * 100 // (3 * cpus)))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(scan_bytes))

    n_turns = int(n_override) if n_override else n_turns_for_sf_dir(sf_dir)
    transcripts = transcripts_table(spark, n_turns)
    transcripts.count()  # warm the cache/file listing outside timings

    from pyspark.sql import functions as F

    from vector_spark.functions.parse import parse_transcripts
    from vector_spark.operators import dedupe, reduce_events, throttle

    def _maybe_profile(sp):
        if os.environ.get("SPARK_GRAFT_PROFILE") == "1":
            return _capture_profile(sp)
        return None

    timings: dict[str, float] = {}

    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "2"))

    def bench(name: str, fn) -> None:
        # min-of-N: the sandbox shares cores with background load, and
        # the first run pays codegen/broadcast warmup — min is the
        # stable estimate of the plan's true cost
        best = None
        for _ in range(iters):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # headline: the full DAG as ONE job — parse, enrich, route-tag,
    # explode, single groupBy(sink, window); includes _unmatched and
    # _dropped sinks so nothing needs a second pass.  Output goes to a
    # parquet sink (parallel write) — collect() would funnel every
    # aggregate row through the driver and cap scaling.
    def _pipeline() -> None:
        from vector_spark.plans.transcript_pipeline import pipeline_stats

        pipeline_stats(spark, transcripts).write.mode("overwrite").parquet(
            "/tmp/vector_spark_bench_out"
        )

    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only == "dedup":
        # near-dedup + clustering over n_turns template-text docs —
        # the training-data ops' own two-size scaling target.  Both
        # quadratic guards ON (templated text is the worst case the
        # guards exist for): tight bucket cap + shingle df-cap keep the
        # candidate volume linear-ish so the measurement tracks the
        # scan/shuffle scaling, not a quadratic blowup.
        from vector_spark.datapipe.dedup import dup_clusters

        docs = transcripts.select(
            (F.crc32("conv_id") * 100000 + F.col("turn_idx")).alias("doc_id"),
            "text",
        )
        bench(
            "pipeline",  # emitted under the headline key for emit()
            lambda: dup_clusters(
                docs, threshold=0.8, max_bucket=200, max_shingle_df=200
            ).count(),
        )
        emit(timings, n_turns, cpus, _maybe_profile(spark))
        return
    if only == "scale_chain":
        # the reference's 12-step chain alone (its own two-size
        # experiment shape) — used by scaling_bench SCALE_TARGET=chain
        from vector_spark.plans.scale_chain import scale_chain, synth_scale_events

        chain_src = synth_scale_events(spark, n_turns)
        bench(
            "pipeline",  # emitted under the headline key for emit()
            lambda: scale_chain(chain_src)
            .write.mode("overwrite")
            .parquet("/tmp/vector_spark_bench_chain"),
        )
        emit(timings, n_turns, cpus, _maybe_profile(spark))
        return

    if only == "approx":
        # the one-shuffle pipeline (HLL approx distinct — the
        # documented 100 TB default) as its own two-size scaling
        # target: isolates whether the exact-distinct second shuffle
        # is what binds the wide leg on this host
        from vector_spark.plans.transcript_pipeline import pipeline_stats

        bench(
            "pipeline",  # headline key for emit()
            lambda: pipeline_stats(spark, transcripts,
                                   exact_distinct=False)
            .write.mode("overwrite")
            .parquet("/tmp/vector_spark_bench_out_approx"),
        )
        emit(timings, n_turns, cpus, _maybe_profile(spark))
        return

    bench("pipeline", _pipeline)

    if only:
        emit(timings, n_turns, cpus, _maybe_profile(spark))
        return

    # one-shuffle variant: HLL approx distinct instead of the exact
    # two-phase count-distinct (the 100 TB default)
    def _pipeline_approx() -> None:
        from vector_spark.plans.transcript_pipeline import pipeline_stats

        pipeline_stats(
            spark, transcripts, exact_distinct=False
        ).write.mode("overwrite").parquet("/tmp/vector_spark_bench_out_approx")

    bench("pipeline_approx_distinct", _pipeline_approx)

    # parse engines head-to-head (full field materialization)
    def _parse(engine: str):
        def run() -> None:
            df = parse_transcripts(transcripts, engine=engine)
            df.groupBy("format").agg(
                F.count(F.lit(1)), F.sum("parsed.http_bytes"),
                F.sum("parsed.latency_ms"),
            ).collect()

        return run

    bench("parse_jvm", _parse("jvm"))
    bench("parse_pandas", _parse("pandas"))

    bench(
        "reduce_conversations",
        lambda: reduce_events(
            transcripts,
            ["conv_id"],
            {"all_text": ("concat_newline", "text"),
             "n_turns": ("count", "text")},
        ).count(),
    )
    bench(
        "dedupe",
        lambda: dedupe(transcripts, match=["conv_id", "turn_idx"]).count(),
    )
    bench(
        "throttle",
        lambda: throttle(
            transcripts, threshold=5, window_sec=600, key_fields=["role"]
        ).count(),
    )

    # training-data ops over the transcript corpus (text dedup at scale)
    from vector_spark.datapipe.dedup import minhash_signatures, simhash
    from vector_spark.datapipe.text import analyze_documents

    docs = transcripts.select(
        (F.crc32("conv_id") * 100000 + F.col("turn_idx")).alias("doc_id"),
        "text",
    )
    bench("minhash_signatures", lambda: minhash_signatures(docs).count())
    bench("simhash", lambda: simhash(docs).count())

    # the full near-dedup chain over the documents corpus: minhash →
    # LSH candidates (bucket-capped) → exact-jaccard rescore (shingle
    # df-capped) → kill-list anti-join.  NOT run on transcript turns:
    # templated log text makes nearly every turn a near-dup of
    # thousands of others, so the honest corpus is the documents table
    # (measured: the un-capped turn-corpus rescore spilled >78 GB).
    def _near_dedup() -> None:
        from vector_spark.datapipe.dedup import jaccard_pairs, lsh_candidates

        # the sf0.1 documents table is ONE small parquet file → one
        # input split → the whole CPU-heavy shingle chain would run on
        # a single core.  Repartition to the core count, mirroring the
        # many-split scan a real corpus gives for free (measured: warm
        # chain 8.7 → 6.3 s)
        corpus = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text")
            .repartition(cpus)
        )
        sigs = minhash_signatures(corpus)
        pairs = jaccard_pairs(
            corpus, lsh_candidates(sigs), threshold=0.8,
            max_shingle_df=1000,
        )
        kill = pairs.select(F.col("id_b").alias("doc_id")).distinct()
        corpus.join(kill, "doc_id", "left_anti").count()

    bench("near_dedup_chain", _near_dedup)

    # duplicate-group formation: the near-dedup chain plus connected
    # components over the rescored pairs (iterative min-label
    # propagation) — measures the full cluster-then-pick-representative
    # path, including the per-round convergence jobs
    def _dup_clusters() -> None:
        from vector_spark.datapipe.dedup import dup_clusters

        corpus = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text")
            .repartition(cpus)
        )
        dup_clusters(corpus, threshold=0.8, max_shingle_df=1000).count()

    bench("dup_clusters", _dup_clusters)

    # incremental snapshot ingest: dedup a dup-injected snapshot
    # against the corpus index (exact anti-join + cross-set LSH +
    # jaccard rescore) — the per-ingest cost a 100 TB pipeline pays
    # per new crawl batch, with the corpus side index-only
    def _incremental_ingest() -> None:
        from vector_spark.datapipe.dedup import (
            build_dedup_index,
            dedup_incremental,
        )

        corpus = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text")
            .repartition(cpus)
        )
        snap = (
            corpus.filter(F.col("doc_id") % 3 == 0)
            .withColumn("doc_id", F.col("doc_id") + 1_000_000)
            .unionByName(
                corpus.filter(F.col("doc_id") % 5 == 0)
                .withColumn("doc_id", F.col("doc_id") + 2_000_000)
                .withColumn(
                    "text", F.concat(F.col("text"), F.lit(" tail words here"))
                )
            )
        )
        idx = tuple(t.persist() for t in build_dedup_index(corpus))
        try:
            dedup_incremental(snap, index=idx).count()
        finally:
            for t in idx:
                t.unpersist()

    bench("incremental_ingest", _incremental_ingest)

    # CCNet perplexity filter over the documents corpus: train the
    # unigram LM on the doc_id%5 reference slice, score every doc,
    # bucket each language head/middle/tail
    def _ccnet() -> None:
        from vector_spark.datapipe.lm import (
            ccnet_buckets, perplexity_scores, unigram_lm,
        )

        corpus = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "lang", "text")
            .repartition(cpus)
        )
        lm = unigram_lm(corpus.filter(F.col("doc_id") % 5 == 0))
        scored = perplexity_scores(corpus, lm).join(
            corpus.select("doc_id", "lang"), "doc_id"
        )
        ccnet_buckets(scored, group_col="lang").groupBy(
            "lang", "bucket"
        ).count().collect()

    bench("ccnet_filter", _ccnet)

    def _classifier() -> None:
        from vector_spark.datapipe.classify import (
            classifier_scores, nb_logodds_weights,
        )

        corpus = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "lang", "source", "text")
            .repartition(cpus)
        )
        seed = corpus.filter(F.col("doc_id") % 2 == 0).withColumn(
            "label", F.col("lang") == "en"
        )
        weights = nb_logodds_weights(seed, label_col="label")
        classifier_scores(corpus, weights).groupBy("keep").agg(
            F.count(F.lit(1)), F.sum("score_milli")
        ).collect()

    bench("classifier_filter", _classifier)

    def _pq() -> None:
        from vector_spark.datapipe.similarity import pq_topk

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") < 32)
        # training (driver k-means on the bounded sample) included:
        # it is a once-per-corpus cost like the IVF/dedup indexes
        pq_topk(emb, q, k=10, m=16, ksub=16, refine=50).count()

    bench("pq_ann", _pq)

    # cluster-balanced diversity sampling: nearest-anchor argmax over
    # the full embedding table + per-region quota (emb_diversity_sample
    # driver query at bench scale)
    def _diversity() -> None:
        from vector_spark.datapipe.similarity import diversity_sample

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        diversity_sample(emb, n_anchors=8, per_cluster=200).count()

    bench("diversity_sample", _diversity)

    bench(
        "text_analysis",
        lambda: analyze_documents(transcripts)
        .agg(F.sum("n_tokens"), F.avg("quality"), F.count(F.lit(1)))
        .collect(),
    )

    # round-4 ops: BPE budgets / language ID / ordinal grading over the
    # documents corpus (same repartition rationale as the dedup chain)
    def _docs():
        return (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .repartition(cpus)
        )

    def _bpe() -> None:
        from vector_spark.datapipe.bpe import bpe_token_counts, learn_bpe

        corpus = _docs().select("doc_id", "source", "text")
        merges = learn_bpe(corpus, num_merges=512, max_words=50_000)
        bpe_token_counts(corpus, merges).groupBy("source").agg(
            F.sum("n_bpe_tokens")
        ).collect()

    bench("bpe_tokens", _bpe)

    def _lang_id() -> None:
        from vector_spark.datapipe.langid import predict_lang

        predict_lang(_docs().select("doc_id", "text")).groupBy(
            "pred_lang"
        ).count().collect()

    bench("lang_id", _lang_id)

    def _dnstap() -> None:
        # the heaviest pure-Python codec path: every turn → dnstap
        # protobuf frame → full parse (envelope + DNS wire) → typed
        # field aggregation
        from vector_spark.functions.dnstap import encode_dnstap, parse_dnstap

        frame = encode_dnstap(
            F.pmod(F.col("turn_idx"), F.lit(65536)),
            F.concat_ws(".", "tool", "conv_id", F.lit("example.com")),
            F.lit(1),
            F.lit("10.0.0.7"),
            F.lit(4242),
            F.unix_timestamp("ts"),
            F.lit(5),
        )
        ev = F.from_json(
            parse_dnstap(frame),
            "messageType string, requestData struct<question: "
            "array<struct<questionType: string>>>",
        )
        transcripts.select(
            ev.getField("requestData").getField("question").getItem(0)
            .getField("questionType").alias("qt")
        ).groupBy("qt").count().collect()

    bench("dnstap_codec", _dnstap)

    def _grades() -> None:
        from vector_spark.datapipe.classify import (
            grade_documents, nb_multiclass_weights, topk_per_group,
        )

        corpus = _docs().select("doc_id", "text")
        seed = corpus.filter(F.col("doc_id") % 2 == 0).withColumn(
            "label", (F.expr("doc_id div 2") % 6).cast("int")
        )
        weights, classes = nb_multiclass_weights(seed)
        graded = grade_documents(corpus, weights, classes)
        topk_per_group(
            graded, 5, group_col="grade", score_col="score_milli",
            id_col="doc_id",
        ).count()

    bench("quality_grades", _grades)

    # round-5 composed curation chain (the doc_curation_e2e driver
    # query at bench scale): langid -> Gopher rules -> LSH near-dedup
    # kill list -> 13-gram decontamination -> per-language token quota.
    # Same capped-jaccard settings as near_dedup_chain (honest corpus,
    # no quadratic blowup).
    def _curation() -> None:
        from vector_spark.datapipe.dedup import (
            decontaminate, jaccard_pairs, lsh_candidates,
            minhash_signatures,
        )
        from vector_spark.datapipe.langid import predict_lang
        from vector_spark.datapipe.sampling import quota_sample
        from vector_spark.datapipe.text import gopher_quality_flags

        corpus = _docs().select("doc_id", "text")
        pred = predict_lang(corpus).select("doc_id", "pred_lang")
        rules = (
            gopher_quality_flags(corpus)
            .filter(F.col("keep"))
            .select("doc_id")
        )
        sigs = minhash_signatures(corpus)
        pairs = jaccard_pairs(
            corpus, lsh_candidates(sigs), threshold=0.8,
            max_shingle_df=1000,
        )
        kill = pairs.select(F.col("id_b").alias("doc_id")).distinct()
        bench_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        benchmark = bench_docs.filter(F.col("doc_id") % 10 == 0).select(
            "doc_id", "text"
        )
        cont = decontaminate(corpus, benchmark, n=13).select("doc_id")
        surv = (
            corpus.join(rules, "doc_id")
            .join(kill, "doc_id", "left_anti")
            .join(cont, "doc_id", "left_anti")
            .join(pred, "doc_id")
        )
        quota_sample(surv, group_col="pred_lang", budget=5000).groupBy(
            "pred_lang"
        ).agg(F.count(F.lit(1)), F.sum("n_tokens")).collect()

    bench("curation_e2e", _curation)

    # the reference's own scaling-regression DAG (12-step sync remap
    # chain, regression/cases/scale_sync_only_8_cpu) re-expressed —
    # apples-to-apples with the reference's two-size experiment
    from vector_spark.plans.scale_chain import scale_chain, synth_scale_events

    chain_src = synth_scale_events(spark, n_turns)

    def _chain() -> None:
        scale_chain(chain_src).write.mode("overwrite").parquet(
            "/tmp/vector_spark_bench_chain"
        )

    bench("scale_chain_12step", _chain)

    # sf1 pipeline (6M turns): 10x the headline scale, catches anything
    # the 600k run hides (spills, skew, partition sizing)
    if os.environ.get("SPARK_GRAFT_BENCH_SF1", "1") != "0":
        big_n = 6_000_000
        big = transcripts_table(spark, big_n)
        big.count()  # materialize the cache outside timings

        def _pipeline_sf1() -> None:
            from vector_spark.plans.transcript_pipeline import pipeline_stats

            pipeline_stats(spark, big).write.mode("overwrite").parquet(
                "/tmp/vector_spark_bench_out_sf1"
            )

        bench("pipeline_sf1", _pipeline_sf1)
        timings["_sf1_turns_per_sec"] = round(big_n / timings["pipeline_sf1"], 1)

    emit(timings, n_turns, cpus, _maybe_profile(spark))


def _capture_profile(spark) -> dict | None:
    """Whole-app shuffle + GC totals from the status REST API (needs
    SPARK_GRAFT_PROFILE=1 so the UI is on).  Cumulative across the
    app's lifetime — warmup and every bench iteration included — so it
    profiles the leg, not a single job; per-leg comparisons between
    identical bench invocations are apples-to-apples."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return None
    # executor GC totals reach the status store on the 10s heartbeat —
    # wait one interval so the final jobs' GC is included
    time.sleep(11)
    app_id = spark.sparkContext.applicationId

    def get(path: str):
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}{path}", timeout=10
        ) as r:
            return json.load(r)

    try:
        stages = get("/stages?status=complete")
        execs = get("/executors")
    except Exception:
        return None
    return {
        "shuffle_read_mb": round(
            sum(s.get("shuffleReadBytes", 0) for s in stages) / 1e6, 1
        ),
        "shuffle_write_mb": round(
            sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6, 1
        ),
        "executor_run_time_ms": sum(
            s.get("executorRunTime", 0) for s in stages
        ),
        # local[] mode has no separate executors — the driver IS the
        # executor, so fall back to it when nothing else reports
        "gc_time_ms": (
            sum(e.get("totalGCTime", 0) for e in execs
                if e.get("id") != "driver")
            or sum(e.get("totalGCTime", 0) for e in execs)
        ),
        "n_executors": sum(
            1 for e in execs if e.get("id") != "driver"
        ),
    }


def emit(timings: dict, n_turns: int, cpus: int,
         profile: dict | None = None) -> None:
    out = {
        "metric": "parse->enrich->route->aggregate pipeline wall time",
        "value": timings["pipeline"],
        "unit": "sec",
        "queries": timings,
        "sf": round(n_turns / 6_000_000, 4),
        "n_turns": n_turns,
        "cpus": cpus,
        "turns_per_sec": round(n_turns / timings["pipeline"], 1),
        "loadavg_start": [round(x, 2) for x in _LOAD_START],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
    }
    if profile:
        out["profile"] = profile
    print(json.dumps(out))


if __name__ == "__main__":
    main()
