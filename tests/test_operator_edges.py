"""Operator edge semantics not covered by the oracle queries:
enrichment date-range + single-row contract, reduce merge strategies,
sample/throttle exclude bypass, incremental_to_absolute mixed kinds."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from vector_spark.enrich import EnrichmentError, assert_unique_key, enrich
from vector_spark.operators import (
    incremental_to_absolute,
    reduce_events,
    sample,
    throttle,
)


def test_enrich_date_range(spark):
    """BetweenDates condition variant
    (/root/reference/lib/vector-vrl/enrichment/src/lib.rs:24-43)."""
    fact = spark.createDataFrame(
        [
            ("search", "user", dt.datetime(2026, 3, 1)),
            ("search", "user", dt.datetime(2027, 3, 1)),  # outside validity
        ],
        "tool string, role string, ts timestamp",
    )
    lookup = spark.createDataFrame(
        [("search", "user", "retrieval",
          dt.datetime(2026, 1, 1), dt.datetime(2026, 12, 31))],
        "tool string, role string, team string, valid_from timestamp, valid_to timestamp",
    )
    out = enrich(fact, lookup, ["tool", "role"], date_col="ts").orderBy("ts").collect()
    assert out[0]["team"] == "retrieval"
    assert out[1]["team"] is None  # NoRowsFound → null enrichment


def test_enrich_more_than_one_row_found(spark):
    lookup = spark.createDataFrame(
        [("a", "x"), ("a", "y")], "k string, v string"
    )
    with pytest.raises(EnrichmentError, match="MoreThanOneRowFound"):
        assert_unique_key(lookup, ["k"])
    # strict enrich refuses to run with a duplicated key
    fact = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(EnrichmentError):
        enrich(fact, lookup, ["k"], strict=True)


def test_reduce_array_strategies(spark):
    df = spark.createDataFrame(
        [
            ("g", 0, ["a", "b"], 1.5, dt.datetime(2026, 1, 1)),
            ("g", 1, ["c"], 2.5, dt.datetime(2026, 1, 2)),
            ("g", 2, ["a", "d"], 3.0, dt.datetime(2026, 1, 3)),
        ],
        "k string, ord int, arr array<string>, x double, ts timestamp",
    )
    out = reduce_events(
        df,
        ["k"],
        {
            "shortest": ("shortest_array", "arr"),
            "longest": ("longest_array", "arr"),
            "flat": ("flat_unique", "arr"),
            "total": ("sum", "x"),
            "first_arr": ("discard", "arr"),
            "last_arr": ("retain", "arr"),
            "joined": ("concat_raw", "k"),
        },
        ord_col="ord",
    ).collect()[0]
    assert out["shortest"] == ["c"]
    assert out["longest"] in (["a", "b"], ["a", "d"])
    assert sorted(out["flat"]) == ["a", "b", "c", "d"]
    assert out["total"] == 7.0
    assert out["first_arr"] == ["a", "b"] and out["last_arr"] == ["a", "d"]
    assert out["joined"] == "ggg"
    assert out["ts"] == dt.datetime(2026, 1, 1) and out["ts_end"] == dt.datetime(2026, 1, 3)


def test_sample_exclude_bypass(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 2 == 0).alias("keep_me")
    )
    out = sample(df, rate=10, key_field="id", exclude=F.col("keep_me"))
    rows = out.collect()
    # every excluded (bypass) row survives regardless of the hash
    assert sum(r["keep_me"] for r in rows) == 500
    assert all(r["sample_rate"] == 10 for r in rows)
    # consistent: same key -> same decision on rerun
    again = sample(df, rate=10, key_field="id", exclude=F.col("keep_me")).collect()
    assert sorted(r["id"] for r in rows) == sorted(r["id"] for r in again)


def test_throttle_exclude_and_cap(spark):
    df = spark.createDataFrame(
        [("k", i, dt.datetime(2026, 1, 1, 0, 0, i)) for i in range(20)],
        "key string, i int, ts timestamp",
    )
    out = throttle(df, threshold=3, window_sec=3600, key_fields=["key"],
                   order_by=["ts", "i"])
    assert out.count() == 3
    out2 = throttle(df, threshold=3, window_sec=3600, key_fields=["key"],
                    order_by=["ts", "i"], exclude=F.col("i") >= 18)
    assert out2.count() == 5  # 3 admitted + 2 bypassed
    # bypassed events must NOT consume threshold slots
    # (transform.rs:103-110): with the first 2 rows excluded, 3
    # non-excluded rows are still admitted
    out3 = throttle(df, threshold=3, window_sec=3600, key_fields=["key"],
                    order_by=["ts", "i"], exclude=F.col("i") < 2)
    assert sorted(r["i"] for r in out3.collect()) == [0, 1, 2, 3, 4]


def test_tag_cardinality_drop_event_passes_null_tags(spark):
    """Events WITHOUT the limited tag bypass drop_event — the reference
    only drops events whose tag VALUE was rejected (ADVICE round 1)."""
    import datetime as _dt

    from vector_spark.operators.metrics import tag_cardinality_limit

    rows = [
        ("a", _dt.datetime(2026, 1, 1, 0, 0, 0)),
        ("b", _dt.datetime(2026, 1, 1, 0, 0, 1)),
        ("c", _dt.datetime(2026, 1, 1, 0, 0, 2)),   # over limit → dropped
        (None, _dt.datetime(2026, 1, 1, 0, 0, 3)),  # no tag → passes
    ]
    df = spark.createDataFrame(rows, "tag string, ts timestamp")
    out = tag_cardinality_limit(df, ["tag"], value_limit=2, action="drop_event")
    got = sorted((r["tag"] or "~null") for r in out.collect())
    assert got == ["a", "b", "~null"]


def test_incremental_to_absolute_mixed_kinds(spark):
    rows = [
        ("c", "ns", "incremental", 1.0, dt.datetime(2026, 1, 1, 0, 0, 0)),
        ("c", "ns", "incremental", 2.0, dt.datetime(2026, 1, 1, 0, 0, 1)),
        ("g", "ns", "absolute", 10.0, dt.datetime(2026, 1, 1, 0, 0, 0)),
        ("c", "ns", "incremental", 4.0, dt.datetime(2026, 1, 1, 0, 0, 2)),
        ("g", "ns", "absolute", 7.0, dt.datetime(2026, 1, 1, 0, 0, 3)),
    ]
    df = spark.createDataFrame(
        rows, "name string, namespace string, kind string, value double, ts timestamp"
    )
    out = incremental_to_absolute(df, ["name", "namespace"])
    got = {(r["name"], r["ts"].second): r["value"] for r in out.collect()}
    assert got[("c", 0)] == 1.0 and got[("c", 1)] == 3.0 and got[("c", 2)] == 7.0
    assert got[("g", 0)] == 10.0 and got[("g", 3)] == 7.0  # absolutes pass through
    assert all(r["kind"] == "absolute" for r in out.collect())


def test_ip_range_join_strategies_agree(spark):
    """Geoip-style range enrichment: bucketed hash-join path produces
    the same result as the broadcast non-equi join, and actually plans
    as a BroadcastHashJoin (not a nested loop)."""
    from vector_spark.enrich import enrich_ip_ranges
    from vector_spark.queries import _IP_RANGES, _enriched

    ranges = spark.createDataFrame(_IP_RANGES, "ip_lo long, ip_hi long, net string")
    fact = _enriched(spark, "/root/testdata/sf0.001").filter(
        F.col("client_ip").isNotNull()
    ).select("conv_id", "turn_idx", "client_ip")
    a = enrich_ip_ranges(fact, ranges, "client_ip", how="bucketed")
    b = enrich_ip_ranges(fact, ranges, "client_ip", how="broadcast").drop(
        "ip_lo", "ip_hi"
    )
    a_sel = a.select("conv_id", "turn_idx", "net")
    b_sel = b.select("conv_id", "turn_idx", "net")
    assert a_sel.exceptAll(b_sel).count() == 0
    assert b_sel.exceptAll(a_sel).count() == 0
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_reduce_segments_flush_triggers(spark):
    """starts_when / ends_when / max_events flush triggers
    (reduce/transform.rs transform_one)."""
    from pyspark.sql import functions as F

    from vector_spark.operators.reduce import reduce_segments

    rows = [("g", i, v) for i, v in
            enumerate(["A", "B", "S", "C", "S", "D"])]
    df = spark.createDataFrame(rows, "g string, i int, v string")

    def segs(out):
        got = {}
        for r in out.orderBy("i").collect():
            got.setdefault(r["_segment"], []).append(r["v"])
        return [got[k] for k in sorted(got)]

    # starts_when: a matching event begins a new group (flush before)
    s = reduce_segments(df, ["g"], ord_col="i",
                        starts_when=F.col("v") == "S")
    assert segs(s) == [["A", "B"], ["S", "C"], ["S", "D"]]

    # ends_when: the matching event is included, then flush
    rows2 = [("g", i, v) for i, v in
             enumerate(["A", "E", "B", "C", "E", "D"])]
    df2 = spark.createDataFrame(rows2, "g string, i int, v string")
    e = reduce_segments(df2, ["g"], ord_col="i",
                        ends_when=F.col("v") == "E")
    assert segs(e) == [["A", "E"], ["B", "C", "E"], ["D"]]

    # max_events alone
    m = reduce_segments(df2, ["g"], ord_col="i", max_events=2)
    assert segs(m) == [["A", "E"], ["B", "C"], ["E", "D"]]

    # combined ends_when + max_events (sequential path)
    rows3 = [("g", i, v) for i, v in enumerate(["A", "B", "C", "E", "D"])]
    df3 = spark.createDataFrame(rows3, "g string, i int, v string")
    c = reduce_segments(df3, ["g"], ord_col="i",
                        ends_when=F.col("v") == "E", max_events=2)
    assert segs(c) == [["A", "B"], ["C", "E"], ["D"]]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="only one of"):
        reduce_segments(df, ["g"], starts_when=F.lit(True),
                        ends_when=F.lit(True))


def test_log_to_metric_all_metrics_mode(spark):
    """all_metrics=true: the log already IS a serialized metric
    (log_to_metric.rs:82-158) — straight projection with defaults."""
    from vector_spark.operators.metrics import METRIC_COLS, log_to_metric

    df = spark.createDataFrame(
        [("cpu", 0.5, dt.datetime(2026, 1, 1))],
        "name string, value double, ts timestamp",
    )
    out = log_to_metric(df, all_metrics=True)
    assert out.columns == METRIC_COLS
    r = out.first()
    assert r["name"] == "cpu" and r["value"] == 0.5
    assert r["kind"] == "absolute" and r["namespace"] == "ns"
    assert r["tags"] == {}


def test_context_window_forward_when_bypass(spark):
    """forward_when events pass through even outside any flush window
    (window/transform.rs:49-94)."""
    from vector_spark.operators.window_context import context_window

    rows = [("c", i, "err" if i == 10 else ("keepme" if i == 2 else "x"))
            for i in range(15)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, v string")
    out = context_window(
        df, F.col("v") == "err",
        group_by=["conv_id"], order_by=["turn_idx"],
        before=2, after=1,
        forward_when=F.col("v") == "keepme",
    )
    got = sorted(r["turn_idx"] for r in out.collect())
    # window around the err at 10 (8..11) plus the bypassed row at 2
    assert got == [2, 8, 9, 10, 11]


def test_trace_to_log_and_static_enrich(spark):
    from vector_spark.operators.metrics import static_enrich, trace_to_log

    df = spark.createDataFrame([("trace", 1)], "kind string, x int")
    out = trace_to_log(df)
    assert out.first()["kind"] == "log"
    # frames without a kind column pass through untouched
    df2 = spark.createDataFrame([(1,)], "x int")
    assert trace_to_log(df2).columns == ["x"]

    enr = static_enrich(df2, {"ami_id": "ami-123", "az": "us-east-1a"})
    r = enr.first()
    assert r["ami_id"] == "ami-123" and r["az"] == "us-east-1a"


def test_find_enrichment_records_multi_row(spark):
    """find_enrichment_table_records semantics: ALL matches per event —
    fan-out rendering and array rendering (event cardinality kept,
    misses become empty arrays)."""
    from vector_spark.enrich import find_enrichment_records

    fact = spark.createDataFrame(
        [(1, "user"), (2, "tool"), (3, "ghost")],
        "event_id long, role string",
    )
    lookup = spark.createDataFrame(
        [("user", "blue"), ("user", "navy"), ("tool", "red")],
        "role string, color string",
    )
    fanned = find_enrichment_records(fact, lookup, ["role"])
    assert fanned.count() == 4  # 2 + 1 + 1 (miss keeps its row)

    arr = find_enrichment_records(
        fact, lookup, ["role"], as_array="matches", id_cols=["event_id"]
    )
    got = {r["event_id"]: sorted(m["color"] for m in r["matches"])
           for r in arr.collect()}
    assert got == {1: ["blue", "navy"], 2: ["red"], 3: []}


def test_sliding_aggregate_edges(spark):
    from pyspark.sql import Row, functions as F

    from vector_spark.operators.aggregate import sliding_aggregate

    df = spark.createDataFrame([
        Row(k="a", ts="2026-01-01 00:10:00", v=1.0),   # windows 23:30, 00:00
        Row(k="a", ts="2026-01-01 00:40:00", v=2.0),   # windows 00:00, 00:30
        Row(k="b", ts="2026-01-01 01:00:00", v=4.0),   # windows 00:30, 01:00
    ]).select("k", F.to_timestamp("ts").alias("ts"), "v")
    out = sliding_aggregate(
        df, keys=["k"], specs={"n": ("count", "*"), "s": ("sum", "v")},
        interval_sec=3600, slide_sec=1800,
    )
    rows = {(r["k"], str(r["window_start"])): (r["n"], r["s"])
            for r in out.collect()}
    assert rows[("a", "2026-01-01 00:00:00")] == (2, 3.0)
    assert rows[("a", "2025-12-31 23:30:00")] == (1, 1.0)
    assert rows[("a", "2026-01-01 00:30:00")] == (1, 2.0)
    assert rows[("b", "2026-01-01 00:30:00")] == (1, 4.0)
    assert rows[("b", "2026-01-01 01:00:00")] == (1, 4.0)
    assert len(rows) == 5
    # tumbling degenerate: slide == interval gives one window per event
    tumb = sliding_aggregate(
        df, keys=["k"], specs={"n": ("count", "*")},
        interval_sec=3600, slide_sec=3600,
    ).collect()
    assert sum(r["n"] for r in tumb) == 3
    import pytest as _pytest

    with _pytest.raises(ValueError, match="multiple"):
        sliding_aggregate(df, keys=["k"], specs={"n": ("count", "*")},
                          interval_sec=3600, slide_sec=1700)


def test_sliding_aggregate_pre_epoch_timestamps(spark):
    """Round-5 advice: a pre-1970 (negative epoch) event must not
    crash the job (the old 0-clamp made first_start > last_start and
    F.sequence raised), and near-epoch events must land in the full
    interval/slide window set, matching Spark's window() semantics."""
    from pyspark.sql import Row, functions as F

    from vector_spark.operators.aggregate import sliding_aggregate

    df = spark.createDataFrame([
        Row(k="a", ts="1969-12-31 23:50:00", v=1.0),  # negative epoch
        Row(k="a", ts="1970-01-01 00:10:00", v=2.0),  # near-epoch
    ]).select("k", F.to_timestamp("ts").alias("ts"), "v")
    out = sliding_aggregate(
        df, keys=["k"], specs={"n": ("count", "*")},
        interval_sec=3600, slide_sec=1800,
    )
    rows = {str(r["window_start"]): r["n"] for r in out.collect()}
    # each event in exactly 2 windows; both share the 23:30 window
    assert rows == {
        "1969-12-31 23:00:00": 1,
        "1969-12-31 23:30:00": 2,
        "1970-01-01 00:00:00": 1,
    }
