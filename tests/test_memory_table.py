"""Memory enrichment table: writable state, last-write-wins, TTL
expiry, per-row TTL override, size-cap rejection, lookup join."""

from __future__ import annotations

import datetime as dt
import shutil

import pytest
from pyspark.sql import functions as F

from vector_spark.operators.memory_table import MemoryTable, TableFullError

DIR = "/tmp/vector_spark_test_memtable"


@pytest.fixture
def tbl_dir():
    shutil.rmtree(DIR, ignore_errors=True)
    yield DIR
    shutil.rmtree(DIR, ignore_errors=True)


def _writes(spark, rows):
    return spark.createDataFrame(rows, "service string, status string, ts timestamp")


def test_last_write_wins_and_ttl_expiry(spark, tbl_dir):
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    tbl = MemoryTable(spark, tbl_dir, ["service"], ttl_sec=600)
    tbl.write(_writes(spark, [
        ("api", "up", t0),
        ("db", "up", t0),
    ]))
    tbl.write(_writes(spark, [
        ("api", "degraded", t0 + dt.timedelta(seconds=500)),
    ]))
    # at t0+550: api was replaced (TTL reset), db still fresh
    s1 = {r["service"]: r["status"]
          for r in tbl.state(F.lit(t0 + dt.timedelta(seconds=550))).collect()}
    assert s1 == {"api": "degraded", "db": "up"}
    # at t0+700: db's write (t0) exceeds ttl → expired; api (t0+500) alive
    s2 = {r["service"]: r["status"]
          for r in tbl.state(F.lit(t0 + dt.timedelta(seconds=700))).collect()}
    assert s2 == {"api": "degraded"}


def test_per_row_ttl_override(spark, tbl_dir):
    t0 = dt.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [("a", "x", t0, 100), ("b", "y", t0, 10000)],
        "k string, v string, ts timestamp, ttl long",
    )
    tbl = MemoryTable(spark, tbl_dir, ["k"], ttl_sec=600, ttl_col="ttl")
    tbl.write(df)
    s = {r["k"]: r["v"]
         for r in tbl.state(F.lit(t0 + dt.timedelta(seconds=500))).collect()}
    assert s == {"b": "y"}  # a's 100s override expired, b's 10000s alive


def test_max_byte_size_rejects_and_keeps_state(spark, tbl_dir):
    t0 = dt.datetime(2026, 1, 1)
    tbl = MemoryTable(spark, tbl_dir, ["service"], ttl_sec=10**9,
                      max_byte_size=20_000)
    tbl.write(_writes(spark, [("api", "up", t0)]))
    before = {r["service"] for r in tbl.state(F.lit(t0)).collect()}
    big = spark.range(5000).select(
        F.concat(F.lit("svc"), F.col("id")).alias("service"),
        F.lit("x" * 50).alias("status"),
        F.lit(t0).alias("ts"),
    )
    with pytest.raises(TableFullError):
        tbl.write(big)
    after = {r["service"] for r in tbl.state(F.lit(t0)).collect()}
    assert after == before == {"api"}
    # the table still accepts small writes after a rejection
    tbl.write(_writes(spark, [("db", "up", t0)]))
    assert {r["service"] for r in tbl.state(F.lit(t0)).collect()} == {"api", "db"}


def test_lookup_is_broadcast_join(spark, tbl_dir):
    t0 = dt.datetime(2026, 1, 1)
    tbl = MemoryTable(spark, tbl_dir, ["service"], ttl_sec=600)
    tbl.write(_writes(spark, [("api", "up", t0), ("db", "down", t0)]))
    events = spark.createDataFrame(
        [("api", 1), ("api", 2), ("db", 3), ("cache", 4)],
        "service string, event_id int",
    )
    out = tbl.lookup(events, F.lit(t0 + dt.timedelta(seconds=60)))
    rows = {r["event_id"]: r["status"] for r in out.collect()}
    assert rows == {1: "up", 2: "up", 3: "down", 4: None}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_expired_export_and_memory_source(spark, tbl_dir):
    """Memory table as a SOURCE (memory/source.rs): state(as_of)
    exports the live items, expired(as_of) exports the TTL-lapsed
    entries instead of dropping them silently; both reachable as a
    `type: memory` config source."""
    from vector_spark.config import build_topology

    t0 = dt.datetime(2026, 1, 1)
    tbl = MemoryTable(spark, tbl_dir, ["service"], ttl_sec=600)
    tbl.write(_writes(spark, [
        ("api", "up", t0),
        ("db", "down", t0 + dt.timedelta(seconds=500)),
    ]))
    as_of = t0 + dt.timedelta(seconds=700)  # api expired, db live
    live = {r["service"] for r in tbl.state(F.lit(as_of)).collect()}
    gone = {r["service"]: r["status"]
            for r in tbl.expired(F.lit(as_of)).collect()}
    assert live == {"db"} and gone == {"api": "up"}
    # state + expired partition the key set
    assert live.isdisjoint(gone)

    base = {"path": tbl_dir, "key_cols": ["service"], "ttl": 600,
            "as_of": "2026-01-01 00:11:40"}
    out = build_topology(spark, {
        "sources": {"in": {"type": "memory", **base}}})["in"]
    assert {r["service"] for r in out.collect()} == {"db"}
    exp = build_topology(spark, {
        "sources": {"in": {"type": "memory", **base,
                           "export": "expired"}}})["in"]
    assert {r["service"] for r in exp.collect()} == {"api"}
