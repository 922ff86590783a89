"""Bloom/cuckoo membership tables + probabilistic tag cardinality.

Reference contracts under test:
- bloom_table.rs: no false negatives ever; false positives possible.
- cuckoo_table.rs: bounded buckets (bucket_size slots), two candidate
  buckets per key, inserts beyond capacity fail explicitly, lookups
  carry the fingerprint.
- tag_cardinality config.rs:125-148: probabilistic mode may admit
  extra values past the limit (bloom collisions), never fewer;
  exact_fingerprint equals exact when fingerprints don't collide.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _keys(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "user_id long")


def test_bloom_no_false_negatives(spark):
    from vector_spark.operators.probabilistic import (
        bloom_build,
        bloom_contains,
    )

    keys = _keys(spark, range(0, 100))
    bits = bloom_build(keys, "user_id", m_bits=2048, k=4)
    probes = _keys(spark, range(0, 300))
    out = bloom_contains(probes, bits, "user_id", m_bits=2048, k=4)
    got = {r["user_id"]: r["bloom_hit"] for r in out.collect()}
    assert all(got[i] for i in range(100)), "false negative"
    # a sane filter rejects most non-members at this sizing
    fps = sum(got[i] for i in range(100, 300))
    assert fps < 60


def test_bloom_null_keys_never_hit(spark):
    from vector_spark.operators.probabilistic import (
        bloom_build,
        bloom_contains,
    )

    keys = _keys(spark, range(10))
    bits = bloom_build(keys, "user_id", m_bits=256, k=2)
    probes = spark.createDataFrame([(None,), (3,)], "user_id long")
    got = {
        r["user_id"]: r["bloom_hit"]
        for r in bloom_contains(
            probes, bits, "user_id", m_bits=256, k=2
        ).collect()
    }
    assert got[None] is False and got[3] is True


def test_cuckoo_bounded_buckets_and_membership(spark):
    from vector_spark.operators.probabilistic import (
        cuckoo_build,
        cuckoo_contains,
    )

    keys = _keys(spark, range(200))
    table = cuckoo_build(
        keys, "user_id", n_buckets=32, bucket_size=4, fingerprint_bits=12
    )
    rows = table.collect()
    assert len(rows) == 200
    placed = [r for r in rows if r["placed"]]
    dropped = [r for r in rows if not r["placed"]]
    assert len(placed) + len(dropped) == 200
    assert dropped, "capacity 128 < 200 keys must drop"
    # bucket occupancy never exceeds bucket_size
    occ: dict[int, int] = {}
    for r in placed:
        occ[r["bucket"]] = occ.get(r["bucket"], 0) + 1
    assert max(occ.values()) <= 4
    # every placed key is found, with its fingerprint surfaced
    probes = _keys(spark, range(250))
    out = cuckoo_contains(
        probes, table, "user_id", n_buckets=32, fingerprint_bits=12
    )
    got = {r["user_id"]: r for r in out.collect()}
    placed_ids = {r["key"] for r in placed}
    for i in placed_ids:
        assert got[i]["cuckoo_hit"], f"placed key {i} not found"
        assert got[i]["fingerprint"] is not None


def test_cuckoo_no_drops_under_capacity(spark):
    from vector_spark.operators.probabilistic import cuckoo_build

    keys = _keys(spark, range(40))
    table = cuckoo_build(
        keys, "user_id", n_buckets=64, bucket_size=4, fingerprint_bits=16
    )
    assert table.filter(~F.col("placed")).count() == 0


def _tagged(spark):
    rows = [(i, float(i), f"v{i % 40}") for i in range(400)]
    return spark.createDataFrame(rows, "event_id long, ts double, tag string")


def test_tag_limit_exact_fingerprint_matches_exact(spark):
    from vector_spark.operators.metrics import tag_cardinality_limit

    df = _tagged(spark)
    exact = tag_cardinality_limit(df, ["tag"], 10, mode="exact")
    fp = tag_cardinality_limit(df, ["tag"], 10, mode="exact_fingerprint")
    assert sorted(map(tuple, exact.collect())) == sorted(
        map(tuple, fp.collect())
    ), "60-bit fingerprints must not collide at 40 values"


def test_tag_limit_probabilistic_superset_of_exact(spark):
    from vector_spark.operators.metrics import tag_cardinality_limit

    df = _tagged(spark)
    exact_ok = {
        r["tag"]
        for r in tag_cardinality_limit(df, ["tag"], 10, mode="exact")
        .filter(F.col("tag").isNotNull())
        .select("tag")
        .distinct()
        .collect()
    }
    # tiny cache -> collisions admit extras; huge cache -> none
    tight = {
        r["tag"]
        for r in tag_cardinality_limit(
            df, ["tag"], 10, mode="probabilistic", cache_bits=32, bloom_k=2
        )
        .filter(F.col("tag").isNotNull())
        .select("tag")
        .distinct()
        .collect()
    }
    wide = {
        r["tag"]
        for r in tag_cardinality_limit(
            df, ["tag"], 10, mode="probabilistic",
            cache_bits=65536, bloom_k=4,
        )
        .filter(F.col("tag").isNotNull())
        .select("tag")
        .distinct()
        .collect()
    }
    assert exact_ok <= tight, "probabilistic may only ADD values"
    assert wide == exact_ok, "a wide cache admits no false positives"
    assert len(tight) > len(exact_ok), (
        "a 32-bit cache over 10 inserted values must collide"
    )


def test_tag_limit_unknown_mode_rejected(spark):
    import pytest

    from vector_spark.operators.metrics import tag_cardinality_limit

    with pytest.raises(ValueError, match="mode"):
        tag_cardinality_limit(_tagged(spark), ["tag"], 5, mode="nope")
