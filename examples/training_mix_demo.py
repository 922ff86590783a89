"""Runnable demo: the full LLM pretraining-data curation pipeline,
end to end over the sf0.001 documents table — every stage is the
driver-gated operator, composed in the order a production corpus run
uses them:

    0. language id            predict_lang (28-language n-gram profiles)
    1. rule-based quality     gopher_quality_flags   (Gopher/C4 rules)
    2. model-based quality    nb_logodds_weights + classifier_scores
       + ordinal grades       nb_multiclass_weights + grade_documents
    3. LM-based quality       unigram_lm + perplexity_scores
                              + ccnet_buckets (head/middle/tail)
    4. decontamination        decontaminate (13-gram benchmark overlap)
    5. near-dedup             minhash + LSH + jaccard + dup_clusters
                              (one representative per duplicate group)
    6. mix + split            temperature_mix, hash_split
    7. packing                pack_sequences over REAL byte-level BPE
                              token counts (learn_bpe + bpe_token_counts)

    python examples/training_mix_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_spark import get_spark  # noqa: E402
from vector_spark.datapipe.bpe import (  # noqa: E402
    bpe_token_counts,
    learn_bpe,
)
from vector_spark.datapipe.classify import (  # noqa: E402
    classifier_scores,
    grade_documents,
    nb_logodds_weights,
    nb_multiclass_weights,
)
from vector_spark.datapipe.langid import predict_lang  # noqa: E402
from vector_spark.datapipe.dedup import (  # noqa: E402
    decontaminate,
    dup_clusters,
)
from vector_spark.datapipe.lm import (  # noqa: E402
    ccnet_buckets,
    perplexity_scores,
    unigram_lm,
)
from vector_spark.datapipe.packing import pack_sequences  # noqa: E402
from vector_spark.datapipe.sampling import (  # noqa: E402
    hash_split,
    temperature_mix,
)
from vector_spark.datapipe.text import gopher_quality_flags  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("training-mix-demo", shuffle_partitions=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()
    print(f"corpus: {n0} docs from {sf_dir}")

    # 0. language id from the text itself (metadata lang untrusted at
    #    web scale): 28-language n-gram profile argmax
    langs = predict_lang(docs).withColumnRenamed("pred_lang", "lang_pred")
    print("0. language id:",
          {r["lang_pred"]: r["count"]
           for r in langs.groupBy("lang_pred").count().collect()})

    # 1. rule-based quality (Gopher + C4 tripwires)
    flagged = gopher_quality_flags(docs)
    rules_ok = flagged.filter(F.col("keep")).select("doc_id")
    print(f"1. gopher/C4 rules keep {rules_ok.count()}/{n0}")

    # 2. model-based quality: NB log-odds classifier trained on a
    #    deterministic seed half (positive = lang 'en')
    seed = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "label", F.col("lang") == "en"
    )
    scored = classifier_scores(docs, nb_logodds_weights(seed))
    clf_ok = scored.filter(F.col("keep")).select("doc_id")
    print(f"2. classifier keeps {clf_ok.count()}/{n0}")

    #    ordinal grades (fineweb-edu shape): 6-class NB, keep grade >= 3
    gseed = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "label", (F.expr("doc_id div 2") % 6).cast("int")
    )
    weights6, classes6 = nb_multiclass_weights(gseed)
    grades = grade_documents(docs, weights6, classes6)
    print("   grade histogram:",
          {r["grade"]: r["count"]
           for r in grades.groupBy("grade").count().collect()})

    # 3. CCNet perplexity buckets: drop each language's tail third
    lm = unigram_lm(docs.filter(F.col("doc_id") % 5 == 0))
    ppl = perplexity_scores(docs, lm).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    buckets = ccnet_buckets(ppl, group_col="lang")
    ccnet_ok = buckets.filter(
        F.col("bucket").isin("head", "middle")
    ).select("doc_id")
    print(f"3. ccnet head+middle keep {ccnet_ok.count()}/{n0}")

    # 4. decontamination vs a held-out benchmark slice
    #    (returns flagged (doc_id, n_contaminated_grams) rows only)
    benchmark = docs.filter(F.col("doc_id") % 10 == 0).select("text")
    contaminated = decontaminate(docs, benchmark)
    print(f"4. decontamination flags {contaminated.count()} docs")

    # 5. near-dedup: minhash -> LSH candidates -> exact rescore ->
    #    connected components -> keep one representative per group
    clusters = dup_clusters(docs, threshold=0.8)
    losers = clusters.filter(
        F.col("doc_id") != F.col("cluster_id")
    ).select("doc_id")
    print(f"5. near-dedup removes {losers.count()} non-representatives")

    # intersect the keeps, subtract the kills
    kept = (
        rules_ok.join(clf_ok, "doc_id")
        .join(ccnet_ok, "doc_id")
        .join(contaminated.select("doc_id"), "doc_id", "left_anti")
        .join(losers, "doc_id", "left_anti")
        .join(docs, "doc_id")
    )
    n_kept = kept.count()
    print(f"=> surviving corpus: {n_kept}/{n0}")

    # 6. temperature-rebalanced mix over languages + leak-free split
    mixed = temperature_mix(kept, "lang", alpha=0.5)
    splits = hash_split(mixed, {"train": 0.9, "val": 0.1})
    splits.groupBy("lang", "split").count().orderBy("lang", "split").show()

    # 7. pack the train split into fixed-token-budget sequences —
    #    budgets counted in REAL byte-level BPE tokens, not whitespace
    merges = learn_bpe(kept, num_merges=256, max_words=50_000)
    train = bpe_token_counts(
        splits.filter(F.col("split") == "train"), merges
    )
    packed = pack_sequences(train, budget=512, token_col="n_bpe_tokens")
    packed.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("docs_in_seq"),
        F.sum("n_tokens").alias("tokens"),
    ).orderBy("seq_id").show(5)
    print("done: curated, mixed, split, packed")


if __name__ == "__main__":
    main()
