"""Training-data pipeline operators: deduplication, similarity search,
text analysis, multimodal plumbing.

These go beyond the reference's transform set — they are the operations
a large-scale training-data pipeline needs over the same engine
(documents/embeddings tables), built Spark-first: shingling and
hashing with built-in expressions, candidate generation as joins,
verification as exact set arithmetic; Python only in the Arrow-batched
multimodal stubs.
"""

from vector_spark.datapipe.dedup import (  # noqa: F401
    connected_components,
    dup_clusters,
    exact_dedup,
    jaccard_pairs,
    lsh_candidates,
    minhash_signatures,
    shingles,
    simhash,
)
from vector_spark.datapipe.lm import (  # noqa: F401
    ccnet_buckets,
    perplexity_scores,
    unigram_lm,
)
from vector_spark.datapipe.sampling import (  # noqa: F401
    hash_split,
    quota_sample,
    temperature_mix,
    temperature_rates,
)
from vector_spark.datapipe.similarity import (  # noqa: F401
    cosine_topk,
    hyperplane_lsh_buckets,
    sq8_quantize,
    sq8_topk,
)
from vector_spark.datapipe.text import (  # noqa: F401
    boilerplate_metrics,
    fingerprint,
    frequent_ngram_hashes,
    lang_id,
    quality_score,
    token_count,
)
