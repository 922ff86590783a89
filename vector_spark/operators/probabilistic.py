"""Probabilistic membership structures: bloom and cuckoo enrichment
tables.

Reference behavior:
- bloom memory table
  (/root/reference/src/enrichment_tables/memory/bloom_table.rs:37-182):
  writes insert keys into a bloom filter sized for ``max_entries``;
  lookups return ``{key, value: NULL}`` when the filter *may* contain
  the key (false positives possible, never false negatives) and no row
  otherwise.
- cuckoo memory table
  (/root/reference/src/enrichment_tables/memory/cuckoo_table.rs:67-80,
  651): a cuckoo filter keyed by ``fingerprint_bits``-bit fingerprints
  in ``bucket_size``-slot buckets with two candidate buckets per key;
  inserts beyond capacity are dropped after ``max_kicks`` evictions;
  lookups also surface the stored ``fingerprint``.

Spark re-expression (documented re-spec):
- All hashing is the PORTABLE md5-prefix hash
  (:func:`vector_spark.datapipe.dedup.portable_hash60`), so the DuckDB
  oracle replays every bit position and fingerprint — the filters are
  deterministic data, not opaque driver state.
- The bloom filter is a DISTRIBUTED bit-position table ``(pos)``:
  building is one explode + distinct (k positions per key), membership
  is an equi-join counting k hits — no driver-side bitset, so a 100 TB
  key set builds with one shuffle and the probe side broadcast-joins
  the (dimension-sized) bit table.
- The cuckoo filter's sequential kick chain has no batch analogue;
  the re-spec is deterministic TWO-CHOICE placement: each key ranks
  into its primary bucket (insertion order = ``order_col``, key
  tie-break); overflow ranks into its alternate bucket's remaining
  capacity; still-overflowing keys are DROPPED and accounted (the
  reference drops after max_kicks — same contract: bounded memory,
  explicit insert failure).  Lookup probes both candidate buckets for
  the fingerprint — false positives on fingerprint collision, exactly
  like the reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from vector_spark.datapipe.dedup import portable_hash60


# ---------------------------------------------------------------------------
# bloom filter


def bloom_positions(key: Column, *, m_bits: int, k: int) -> Column:
    """The k bit positions of ``key`` in an ``m_bits``-wide filter
    (array<long>); hash i salts the key with ``bloom<i>:``."""
    return F.array(
        *[
            portable_hash60(
                F.concat_ws(":", F.lit(f"bloom{i}"), key.cast("string"))
            )
            % m_bits
            for i in range(k)
        ]
    )


def bloom_build(
    keys: DataFrame, key_col: str, *, m_bits: int = 4096, k: int = 4
) -> DataFrame:
    """Build the filter from a key set: the distinct bit positions its
    keys set — one explode + one distinct, fully distributed."""
    return (
        keys.filter(F.col(key_col).isNotNull())
        .select(
            F.explode(
                bloom_positions(F.col(key_col), m_bits=m_bits, k=k)
            ).alias("pos")
        )
        .distinct()
    )


def bloom_contains(
    probes: DataFrame,
    bits: DataFrame,
    key_col: str,
    *,
    m_bits: int = 4096,
    k: int = 4,
    result_col: str = "bloom_hit",
) -> DataFrame:
    """Membership test per distinct probe key: true iff ALL k of its
    positions are set.  The distinct-key frame explodes xk and joins
    the broadcast bit table; the (big) probe frame then joins the
    small per-key verdict — the fact side never shuffles."""
    keys = (
        probes.filter(F.col(key_col).isNotNull()).select(key_col).distinct()
    )
    hits = (
        keys.withColumn(
            "_pos",
            F.explode(bloom_positions(F.col(key_col), m_bits=m_bits, k=k)),
        )
        .join(F.broadcast(bits.withColumnRenamed("pos", "_pos")), "_pos")
        .groupBy(key_col)
        .agg((F.count(F.lit(1)) == k).alias(result_col))
    )
    return probes.join(F.broadcast(hits), key_col, "left").withColumn(
        result_col, F.coalesce(F.col(result_col), F.lit(False))
    )


# ---------------------------------------------------------------------------
# cuckoo filter


def cuckoo_fingerprint(key: Column, *, fingerprint_bits: int = 12) -> Column:
    return portable_hash60(
        F.concat_ws(":", F.lit("cfp"), key.cast("string"))
    ) % (1 << fingerprint_bits)


def _cuckoo_b1(key: Column, n_buckets: int) -> Column:
    return (
        portable_hash60(F.concat_ws(":", F.lit("cb1"), key.cast("string")))
        % n_buckets
    )


def _cuckoo_b2(b1: Column, fp: Column, n_buckets: int) -> Column:
    # partial-key cuckoo: alternate bucket derives from (b1, fp) only,
    # so lookups can compute it from the fingerprint alone
    return b1.bitwiseXOR(
        portable_hash60(F.concat_ws(":", F.lit("cb2"), fp.cast("string")))
    ) % n_buckets


def cuckoo_build(
    keys: DataFrame,
    key_col: str,
    *,
    n_buckets: int = 64,
    bucket_size: int = 4,
    fingerprint_bits: int = 12,
    order_col: str | None = None,
) -> DataFrame:
    """Deterministic two-choice placement of the distinct key set.

    Returns one row per key: (key, fingerprint, bucket, placed) where
    ``bucket`` is NULL for dropped keys.  Insertion order is
    ``order_col`` (key tie-break), or the key itself — windows
    partition by bucket, so no key set ever funnels through one task.
    """
    kc = F.col(key_col)
    base = keys.filter(kc.isNotNull())
    if order_col is None:
        base = base.select(key_col).distinct().withColumn("_ord", kc)
    else:
        base = base.groupBy(key_col).agg(F.min(order_col).alias("_ord"))
    fp = cuckoo_fingerprint(kc, fingerprint_bits=fingerprint_bits)
    b1 = _cuckoo_b1(kc, n_buckets)
    t = base.select(
        kc.alias("key"),
        F.col("_ord"),
        fp.alias("fingerprint"),
        b1.alias("_b1"),
    ).withColumn(
        "_b2", _cuckoo_b2(F.col("_b1"), F.col("fingerprint"), n_buckets)
    )
    w1 = W.partitionBy("_b1").orderBy("_ord", "key")
    t = t.withColumn("_rn1", F.row_number().over(w1))
    placed1 = t.filter(F.col("_rn1") <= bucket_size).select(
        "key", "fingerprint", F.col("_b1").alias("bucket")
    )
    occ1 = placed1.groupBy("bucket").agg(F.count(F.lit(1)).alias("_occ"))
    w2 = W.partitionBy("_b2").orderBy("_ord", "key")
    overflow = (
        t.filter(F.col("_rn1") > bucket_size)
        .withColumn("_rn2", F.row_number().over(w2))
        .join(
            F.broadcast(occ1.withColumnRenamed("bucket", "_b2")),
            "_b2",
            "left",
        )
        .withColumn("_occ", F.coalesce(F.col("_occ"), F.lit(0)))
    )
    placed2 = overflow.filter(
        F.col("_rn2") + F.col("_occ") <= bucket_size
    ).select("key", "fingerprint", F.col("_b2").alias("bucket"))
    dropped = overflow.filter(
        F.col("_rn2") + F.col("_occ") > bucket_size
    ).select("key", "fingerprint", F.lit(None).cast("long").alias("bucket"))
    out = placed1.unionByName(placed2).unionByName(dropped)
    return out.withColumn("placed", F.col("bucket").isNotNull())


def cuckoo_contains(
    probes: DataFrame,
    table: DataFrame,
    key_col: str,
    *,
    n_buckets: int = 64,
    fingerprint_bits: int = 12,
    result_col: str = "cuckoo_hit",
    fingerprint_col: str = "fingerprint",
) -> DataFrame:
    """Probe both candidate buckets for the key's fingerprint.  Like
    the reference, the result carries the ``fingerprint`` next to the
    hit flag (cuckoo_table.rs:651).  Same plan shape as
    :func:`bloom_contains`: distinct keys -> verdict -> broadcast back."""
    stored = (
        table.filter(F.col("placed"))
        .select("bucket", F.col("fingerprint").alias("_fp"))
        .distinct()
    )
    kc = F.col(key_col)
    keys = probes.filter(kc.isNotNull()).select(key_col).distinct()
    fp = cuckoo_fingerprint(kc, fingerprint_bits=fingerprint_bits)
    b1 = _cuckoo_b1(kc, n_buckets)
    cand = (
        keys.select(key_col, fp.alias("_fp"), b1.alias("_b1"))
        .withColumn("_b2", _cuckoo_b2(F.col("_b1"), F.col("_fp"), n_buckets))
        .withColumn("bucket", F.explode(F.array("_b1", "_b2")))
    )
    hit_keys = (
        cand.join(F.broadcast(stored), ["bucket", "_fp"], "left_semi")
        .select(key_col)
        .distinct()
        .withColumn(result_col, F.lit(True))
    )
    verdict = keys.select(
        key_col, fp.alias(fingerprint_col)
    ).join(F.broadcast(hit_keys), key_col, "left")
    return probes.join(F.broadcast(verdict), key_col, "left").withColumn(
        result_col, F.coalesce(F.col(result_col), F.lit(False))
    )
