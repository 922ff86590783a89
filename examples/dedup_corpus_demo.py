"""Runnable demo: the training-data dedup / similarity pipeline.

Builds a duplicate-injected corpus from the sf0.001 documents table and
runs the full near-dedup chain — exact dedup, MinHash+LSH candidates,
exact-jaccard rescore, kill-list anti-join — plus an ANN probe over the
embeddings table.  Mirrors `doc_near_dedup_corpus` /
`emb_cosine_topk` from the driver contract.

    python examples/dedup_corpus_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_spark import get_spark  # noqa: E402
from vector_spark.datapipe.dedup import (  # noqa: E402
    exact_dedup,
    jaccard_pairs,
    lsh_bucket_stats,
    lsh_candidates,
    minhash_signatures,
)
from vector_spark.datapipe.similarity import cosine_topk  # noqa: E402
from vector_spark.queries_datapipe import _dup_df  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("dedup_demo", shuffle_partitions=8)

    dup = _dup_df(spark, sf_dir)
    n0 = dup.count()
    print(f"corpus with injected duplicates: {n0} docs")

    n_exact = exact_dedup(dup).count()
    print(f"after exact dedup:               {n_exact} docs "
          f"({n0 - n_exact} exact clones removed)")

    sigs = minhash_signatures(dup)
    stats = lsh_bucket_stats(sigs).first()
    print(f"LSH buckets: {stats['n_buckets']}, oversized (capped): "
          f"{stats['n_oversized']}, rows in oversized: "
          f"{stats['rows_in_oversized']}")

    pairs = jaccard_pairs(dup, lsh_candidates(sigs), threshold=0.8)

    # duplicate GROUPS via connected components (doc_dup_clusters):
    # transitive clustering keeps one representative per group, where
    # kill-higher-id of raw pairs can over-delete chains
    from vector_spark.datapipe.dedup import connected_components

    comp = connected_components(pairs)
    groups = comp.groupBy("cluster_id").count()
    g = groups.agg(
        F.count(F.lit(1)).alias("n"), F.max("count").alias("largest")
    ).first()
    print(f"duplicate groups:                {g['n']} "
          f"(largest has {g['largest']} members)")

    kill = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    # persist: everything below (quality gates, decontamination, the
    # ingest index) reads the accepted corpus several times — in
    # production this is the WRITTEN corpus table, so materialize the
    # demo equivalent instead of recomputing the whole LSH chain per use
    survivors = dup.join(kill, "doc_id", "left_anti").persist()
    print(f"after near-dedup (jaccard>=0.8): {survivors.count()} docs")

    # quality gate: Gopher rules + repetition metrics
    from vector_spark.datapipe.text import (
        gopher_quality_flags,
        repetition_metrics,
    )

    flags = gopher_quality_flags(survivors)
    kept = flags.filter("keep").select("doc_id")
    print(f"after Gopher quality rules:      {kept.count()} docs")
    rep = repetition_metrics(survivors)
    heavy = rep.filter("top2gram_char_frac > 0.2 OR dup5gram_char_frac > 0.5")
    print(f"repetition-heavy docs flagged:   {heavy.count()}")

    # benchmark decontamination: every 10th original doc stands in for
    # the held-out eval set
    from vector_spark.datapipe.dedup import decontaminate

    bench = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text")
    )
    contaminated = decontaminate(survivors, bench, n=13)
    print(f"benchmark-contaminated docs:     {contaminated.count()} "
          "(dropped before training)")

    # incremental ingest: dedup a NEW snapshot against the accepted
    # corpus via the persisted 3-table index — zero corpus re-reads
    from vector_spark.datapipe.dedup import build_dedup_index, dedup_incremental
    from vector_spark.queries_datapipe import _snapshot_df

    idx = build_dedup_index(survivors)
    snap = _snapshot_df(spark, sf_dir)
    n_snap = snap.count()
    ingested = dedup_incremental(snap, index=idx)
    print(f"snapshot ingest:                 {ingested.count()}/{n_snap} "
          "docs accepted (rest already in corpus)")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    probe = emb.limit(3)
    print("cosine top-3 neighbours for 3 probe vectors:")
    cosine_topk(emb, probe, k=3).show(truncate=False)


if __name__ == "__main__":
    main()
