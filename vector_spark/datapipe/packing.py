"""Sequence packing: lay documents out contiguously in id order and
assign each to the fixed-token-budget training sequence where its
first token lands (the concat-then-chunk pretraining layout).

The core primitive is a distributed EXCLUSIVE PREFIX SUM over the
token counts — the textbook two-phase scan, expressed without ever
funnelling the corpus through one task:

1. a deterministic coarse bucket key from the id range (one tiny
   min/max agg job — NOT spark_partition_id, whose mapping can change
   between the two jobs when range-partition boundaries are resampled);
2. per-bucket token totals, collected to the driver — bounded at one
   row per bucket (like IVF's training sample), turned into exclusive
   bucket offsets and broadcast back;
3. a per-bucket window cumsum (partitionBy(bucket) — parallel across
   buckets, never a global single-partition window) + the bucket
   offset = the exact global exclusive prefix.

The result is independent of bucket count and partitioning — only the
(id order, token counts) define it — so a DuckDB oracle with a plain
global window reproduces it bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from vector_spark.datapipe.text import token_count

#: default number of prefix-sum buckets: enough for parallelism, small
#: enough that the per-bucket totals collect stays trivial
PACK_BUCKETS = 256


def bucketed_prefix_sum(
    d: DataFrame,
    *,
    bucket_col: str,
    order_cols: list[str],
    value_col: str,
    partition_cols: list[str] | None = None,
    out_col: str = "_prefix",
) -> DataFrame | None:
    """The two-phase exclusive-prefix-sum scan shared by
    :func:`pack_sequences` and
    :func:`vector_spark.datapipe.sampling.quota_sample`: per-(partition,
    bucket) totals collected (one row per bucket — bounded), exclusive
    bucket offsets broadcast back with the SOURCE frame's schema (so
    all-NULL partition keys can never hit createDataFrame type
    inference), and a per-(partition, bucket) window cumsum — parallel
    across buckets, never a whole partition through one task.

    ``d`` must already carry ``bucket_col`` ordered consistently with
    ``order_cols`` (rows of a lower bucket sort before every row of a
    higher one within a partition).  Returns ``d`` + ``out_col``, or
    ``None`` when ``d`` is empty (callers decide their empty shape).
    """
    from pyspark.sql.types import LongType, StructField, StructType

    pcols = list(partition_cols or [])
    keys = pcols + [bucket_col]
    totals = d.groupBy(*keys).agg(F.sum(value_col).alias("_t")).collect()
    if not totals:
        return None
    by_part: dict = {}
    for r in totals:
        by_part.setdefault(tuple(r[c] for c in pcols), []).append(
            (r[bucket_col], r["_t"])
        )
    offsets = []
    for part, rows in by_part.items():
        running = 0
        for b, t in sorted(rows):
            offsets.append((*part, b, running))
            running += t
    schema = StructType(
        [d.schema[c] for c in keys] + [StructField("_off", LongType())]
    )
    off = F.broadcast(d.sparkSession.createDataFrame(offsets, schema))
    w = W.partitionBy(*keys).orderBy(*order_cols)
    return (
        d.join(off, keys)
        .withColumn("_run", F.sum(value_col).over(w))
        .withColumn(out_col, F.col("_off") + F.col("_run") - F.col(value_col))
        .drop("_off", "_run")
    )


def pack_sequences(
    df: DataFrame,
    *,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_col: str | None = None,
    n_buckets: int = PACK_BUCKETS,
) -> DataFrame:
    """Per-doc packing assignment: (id, n_tokens, token_offset, seq_id,
    seq_offset).

    ``seq_id`` = floor(exclusive_token_prefix / budget): the sequence
    where the doc's first token lands (a doc longer than the remaining
    space straddles into the next sequence — standard concat-then-chunk
    semantics, the chunker splits it).  ``seq_offset`` is the doc's
    first-token position within that sequence.

    ``token_col`` supplies precomputed token counts (e.g. real
    tokenizer output); default is the whitespace count over normalized
    text (:func:`vector_spark.datapipe.text.token_count`).
    """
    toks: Column = (
        token_count(F.col(text_col)) if token_col is None
        else F.col(token_col)
    )
    d = df.select(
        F.col(id_col),
        F.coalesce(toks.cast("long"), F.lit(0)).alias("n_tokens"),
    )

    lo, hi = d.agg(F.min(id_col), F.max(id_col)).first()
    if lo is None:
        return d.select(
            id_col, "n_tokens",
            F.lit(None).cast("long").alias("token_offset"),
            F.lit(None).cast("long").alias("seq_id"),
            F.lit(None).cast("long").alias("seq_offset"),
        )
    width = max(1, math.ceil((int(hi) - int(lo) + 1) / n_buckets))
    bucket = F.floor((F.col(id_col) - F.lit(int(lo))) / F.lit(width))
    d = d.withColumn("_b", bucket.cast("long"))

    summed = bucketed_prefix_sum(
        d, bucket_col="_b", order_cols=[id_col], value_col="n_tokens",
        out_col="token_offset",
    )
    return (
        summed
        .withColumn("seq_id", F.floor(F.col("token_offset") / budget))
        .withColumn(
            "seq_offset", F.col("token_offset") - F.col("seq_id") * budget
        )
        .select(id_col, "n_tokens", "token_offset", "seq_id", "seq_offset")
    )


def sequence_stats(packed: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Per-sequence rollup of a :func:`pack_sequences` result: how many
    docs start in each sequence and how many of their tokens it
    anchors — the packing-quality report (tail sequences under-filled,
    giant docs straddling many)."""
    return packed.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("anchored_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )
