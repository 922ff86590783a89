"""DDSketch / Distribution / Set metric value types: the merge
invariant (re-aggregation == direct aggregation, exact map equality)
and the alpha relative-error guarantee."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.operators.sketch import (
    ddsketch,
    ddsketch_merge,
    ddsketch_quantile,
    distribution,
    set_values,
)


@pytest.fixture(scope="module")
def latencies(spark):
    # deterministic skewed positives + a few zeros, two groups x 4 windows
    df = spark.range(8000).select(
        (F.col("id") % 2).cast("string").alias("svc"),
        (F.col("id") % 4).alias("win"),
        F.when(F.col("id") % 100 == 0, 0.0)
        .otherwise((F.pmod(F.col("id") * 2654435761, F.lit(997)) + 1).cast("double"))
        .alias("v"),
    )
    return df.persist()


def test_merge_equals_direct(latencies):
    direct = ddsketch(latencies, ["svc"], "v")
    per_window = ddsketch(latencies, ["svc", "win"], "v")
    merged = ddsketch_merge(per_window, ["svc"])
    a = {r["svc"]: (dict(r["sketch"]), r["n_zero"], r["total"])
         for r in direct.collect()}
    b = {r["svc"]: (dict(r["sketch"]), r["n_zero"], r["total"])
         for r in merged.collect()}
    assert a == b  # exact: merge loses nothing


def test_quantile_relative_error(latencies):
    sk = ddsketch(latencies, ["svc"], "v")
    out = sk.select(
        "svc",
        *[
            ddsketch_quantile(
                F.col("sketch"), F.col("n_zero"), F.col("total"), q
            ).alias(f"p{int(q * 100)}")
            for q in (0.5, 0.95, 0.99)
        ],
    )
    est = {r["svc"]: r for r in out.collect()}
    pdf = latencies.toPandas()
    for svc in ("0", "1"):
        vals = sorted(pdf[pdf.svc == svc]["v"])
        for q in (0.5, 0.95, 0.99):
            exact = vals[min(len(vals) - 1, int(q * len(vals)))]
            got = est[svc][f"p{int(q * 100)}"]
            assert abs(got - exact) / exact <= 0.03, (svc, q, got, exact)


def test_quantile_zero_bin(spark):
    df = spark.createDataFrame(
        [("a", 0.0)] * 9 + [("a", 100.0)], "g string, v double"
    )
    sk = ddsketch(df, ["g"], "v")
    p50 = sk.select(
        ddsketch_quantile(F.col("sketch"), F.col("n_zero"), F.col("total"), 0.5)
    ).first()[0]
    assert p50 == 0.0


def test_null_values_are_not_samples(spark):
    """NULL input must be ignored entirely — not counted as zero
    (reference AgentDDSketch only ingests real samples)."""
    df = spark.createDataFrame(
        [("a", None), ("a", None), ("a", 100.0), ("a", 0.0)],
        "g string, v double",
    )
    row = ddsketch(df, ["g"], "v").first()
    assert row["total"] == 2  # the NULLs are gone
    assert row["n_zero"] == 1
    p50 = (
        ddsketch(df, ["g"], "v")
        .select(ddsketch_quantile(
            F.col("sketch"), F.col("n_zero"), F.col("total"), 0.99))
        .first()[0]
    )
    assert abs(p50 - 100.0) / 100.0 <= 0.03


def test_distribution_and_set(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("a", 2.0), ("b", 3.0)], "g string, v double"
    )
    d = {r["g"]: dict(r["dist"]) for r in distribution(df, ["g"], "v").collect()}
    assert d == {"a": {1.0: 2, 2.0: 1}, "b": {3.0: 1}}
    s = {r["g"]: list(r["values"]) for r in set_values(df, ["g"], "v").collect()}
    assert s == {"a": [1.0, 2.0], "b": [3.0]}


def test_negative_values_mirrored_buckets(spark):
    """AgentDDSketch handles negatives (metric/value.rs:83): mirrored
    keys keep value order, quantiles stay within alpha on signed data."""
    vals = [-500.0, -100.0, -10.0, 0.0, 0.0, 5.0, 50.0, 500.0, 5000.0, 50000.0]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    sk = ddsketch(df, ["g"], "v")
    r = sk.first()
    assert r["n_zero"] == 2 and r["total"] == 10
    keys = sorted(r["sketch"].keys())
    assert sum(1 for k in keys if k < 0) == 3  # three negative buckets
    import pyspark.sql.functions as SF

    for q in (0.1, 0.25, 0.5, 0.9):
        est = sk.select(
            ddsketch_quantile(SF.col("sketch"), SF.col("n_zero"),
                              SF.col("total"), q)
        ).first()[0]
        import math as _math
        exact = sorted(vals)[_math.ceil(q * len(vals)) - 1]
        if exact == 0.0:
            assert est == 0.0, (q, est)
        else:
            assert abs(est - exact) / abs(exact) <= 0.011, (q, est, exact)
    # merge invariant still holds with signed buckets
    df2 = spark.createDataFrame(
        [("g", i % 3, v) for i, v in enumerate(vals)],
        "g string, w int, v double",
    )
    direct = ddsketch(df2, ["g"], "v").first()
    merged = ddsketch_merge(ddsketch(df2, ["g", "w"], "v"), ["g"]).first()
    assert dict(direct["sketch"]) == dict(merged["sketch"])
    assert (direct["n_zero"], direct["total"]) == (
        merged["n_zero"], merged["total"]
    )


def test_hll_merge_equals_direct(spark):
    """HLL union of per-window sketches estimates exactly what the
    directly-built sketch estimates (sketch state is order-insensitive),
    and within ~2% of true cardinality."""
    import pyspark.sql.functions as SF

    from vector_spark.operators.sketch import hll, hll_estimate, hll_merge

    df = spark.range(50_000).select(
        (SF.col("id") % 2).cast("string").alias("svc"),
        (SF.col("id") % 8).alias("win"),
        SF.concat(SF.lit("conv-"), (SF.col("id") % 9173).cast("string"))
        .alias("conv"),
    )
    direct = hll(df, ["svc"], "conv")
    merged = hll_merge(hll(df, ["svc", "win"], "conv"), ["svc"])
    d = {r["svc"]: r["est"]
         for r in direct.select("svc", hll_estimate(SF.col("hll")).alias("est")).collect()}
    m = {r["svc"]: r["est"]
         for r in merged.select("svc", hll_estimate(SF.col("hll")).alias("est")).collect()}
    assert d == m
    for v in d.values():
        assert abs(v - 9173) / 9173 < 0.05


def test_pipeline_stats_approx_distinct_single_shuffle(spark):
    """exact_distinct=False: approx_count_distinct folds n_convs into
    the single (sink, window) aggregation — ONE shuffle end-to-end,
    the 100 TB default; values within ~2% of exact."""
    from vector_spark.data.transcripts import transcripts_table
    from vector_spark.plans.transcript_pipeline import pipeline_stats

    t = transcripts_table(spark, 6000)
    approx = pipeline_stats(spark, t, exact_distinct=False)
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    exact = pipeline_stats(spark, t)
    e = {(r["sink"], r["window_start"]): r["n_convs"] for r in exact.collect()}
    a = {(r["sink"], r["window_start"]): r["n_convs"] for r in approx.collect()}
    assert set(e) == set(a)
    for k in e:
        assert abs(a[k] - e[k]) <= max(2, 0.05 * e[k]), (k, a[k], e[k])
