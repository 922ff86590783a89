"""Snapshot table: atomic commits, time travel, rollback, crash safety."""

from __future__ import annotations

import os
import shutil

import pytest

from vector_spark.data.transcripts import transcripts_table
from vector_spark.sources.table import SnapshotTable

TBL = "/tmp/vector_spark_test_table"


@pytest.fixture
def tbl_dir():
    shutil.rmtree(TBL, ignore_errors=True)
    yield TBL
    shutil.rmtree(TBL, ignore_errors=True)


def test_append_overwrite_time_travel(spark, tbl_dir):
    t = transcripts_table(spark, 1000)
    tbl = SnapshotTable(spark, tbl_dir)
    v1 = tbl.commit(t.filter("turn_idx = 0"), mode="overwrite")
    n1 = tbl.read().count()
    v2 = tbl.commit(t.filter("turn_idx = 1"), mode="append")
    assert tbl.read().count() == n1 + t.filter("turn_idx = 1").count()
    assert tbl.read(version=v1).count() == n1  # time travel
    v3 = tbl.commit(t.filter("turn_idx = 2"), mode="overwrite")
    assert tbl.read().count() == t.filter("turn_idx = 2").count()
    hist = tbl.history()
    assert [h["id"] for h in hist] == [v3, v2, v1]
    assert hist[0]["operation"] == "overwrite"


def test_rollback(spark, tbl_dir):
    t = transcripts_table(spark, 1000)
    tbl = SnapshotTable(spark, tbl_dir)
    v1 = tbl.commit(t.limit(10), mode="overwrite")
    v2 = tbl.commit(t.limit(5), mode="append")
    tbl.rollback(v1)
    assert tbl.read().count() == 10
    # the later snapshot is still reachable explicitly
    assert tbl.read(version=v2).count() == 15
    # a commit after rollback must allocate PAST v2, not reuse its id —
    # v2's data and manifest stay intact (ADVICE round 1)
    v3 = tbl.commit(t.limit(7), mode="append")
    assert v3 > v2
    assert tbl.read().count() == 17  # v1 (10) + 7
    assert tbl.read(version=v2).count() == 15  # untouched


def test_uncommitted_data_is_invisible(spark, tbl_dir):
    """Crash between data write and HEAD flip: readers see the old
    snapshot (the acked-delivery property)."""
    t = transcripts_table(spark, 1000)
    tbl = SnapshotTable(spark, tbl_dir)
    tbl.commit(t.limit(10), mode="overwrite")
    # simulate a crashed writer: data dir exists, no manifest/HEAD flip
    orphan = os.path.join(tbl_dir, "snap-00000099")
    t.limit(3).write.parquet(orphan)
    assert tbl.read().count() == 10
    assert tbl.history()[0]["id"] == tbl._head()


def test_expire_snapshots_collects_orphan_line(spark, tbl_dir):
    """rollback(v1) then commit strands v2; expire removes its manifest
    and data while every ancestor of HEAD stays time-travelable."""
    t = transcripts_table(spark, 1000)
    tbl = SnapshotTable(spark, tbl_dir)
    v1 = tbl.commit(t.limit(10), mode="overwrite")
    v2 = tbl.commit(t.limit(5), mode="append")
    tbl.rollback(v1)
    v3 = tbl.commit(t.limit(7), mode="append")

    expired = tbl.expire_snapshots()
    assert expired == [v2]
    # live line intact: HEAD and its ancestry still read
    assert tbl.read().count() == 17
    assert tbl.read(version=v1).count() == 10
    assert tbl.read(version=v3).count() == 17
    # the orphan is gone
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        tbl._manifest(v2)
    # v2's unshared data dir was removed; v1's (shared with HEAD) kept
    dirs = {d for d in os.listdir(tbl_dir) if d.startswith("snap-")}
    assert f"snap-{v1:08d}" in dirs and f"snap-{v3:08d}" in dirs
    assert f"snap-{v2:08d}" not in dirs
    # idempotent
    assert tbl.expire_snapshots() == []
