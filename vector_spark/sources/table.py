"""Snapshot tables — Iceberg-semantics storage without the Iceberg jar.

The north rule's input/output tables are Iceberg; its connector jar is
not in this container, so this module provides the SEMANTICS the
pipeline relies on — atomic snapshot commits, time travel, rollback —
over plain parquet + a manifest directory.  On a real cluster the same
call sites switch to `.format("iceberg")` (sinks.write_sink already
routes it); the pipeline code doesn't change.

Commit protocol (single-writer, crash-safe):
1. write the new data directory (parquet, _SUCCESS marker),
2. write the snapshot manifest (id, parent, file set, rows, op),
3. atomically flip the HEAD pointer (os.replace).
A crash before step 3 leaves orphan data but a consistent table — the
reference's acked-delivery guarantee re-expressed for batch
(/root/reference/lib/vector-common/src/finalization.rs end-to-end acks).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.manifest_dir = os.path.join(path, "_manifests")
        self.head_path = os.path.join(path, "_HEAD")
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- internals -------------------------------------------------------

    def _head(self) -> int | None:
        try:
            with open(self.head_path) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def _manifest(self, snap_id: int) -> dict:
        with open(os.path.join(self.manifest_dir, f"{snap_id}.json")) as f:
            return json.load(f)

    @staticmethod
    def _parquet_rows(data_dir: str) -> int:
        """Row count from parquet footers (driver-side metadata read) —
        no extra Spark job per commit."""
        import pyarrow.parquet as pq

        return sum(
            pq.ParquetFile(os.path.join(data_dir, n)).metadata.num_rows
            for n in os.listdir(data_dir)
            if n.endswith(".parquet")
        )

    def _flip_head(self, snap_id: int) -> None:
        tmp = self.head_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(snap_id))
        os.replace(tmp, self.head_path)  # atomic on POSIX

    # -- public API ------------------------------------------------------

    def commit(self, df: DataFrame, mode: str = "append") -> int:
        """Write a snapshot; returns its id.  ``append`` unions with the
        parent's file set; ``overwrite`` starts a fresh set."""
        parent = self._head()
        # allocate past ALL existing manifests, not head+1: a commit
        # after rollback(v) must not reuse (and overwrite) id v+1 —
        # later snapshots stay readable by explicit version
        existing = [
            int(n[:-5])
            for n in os.listdir(self.manifest_dir)
            if n.endswith(".json") and n[:-5].isdigit()
        ]
        snap_id = max(existing, default=0) + 1
        data_dir = os.path.join(self.path, f"snap-{snap_id:08d}")
        df.write.mode("overwrite").parquet(data_dir)
        rows = self._parquet_rows(data_dir)
        files = [data_dir]
        total = rows
        if mode == "append" and parent is not None:
            pm = self._manifest(parent)
            files = pm["files"] + files
            total = pm["total_rows"] + rows
        elif mode not in ("append", "overwrite"):
            raise ValueError(f"unknown commit mode {mode!r}")
        manifest = {
            "id": snap_id,
            "parent": parent,
            "operation": mode,
            "files": files,
            "rows_added": rows,
            "total_rows": total,
            "ts": time.time(),
        }
        with open(os.path.join(self.manifest_dir, f"{snap_id}.json"), "w") as f:
            json.dump(manifest, f)
        self._flip_head(snap_id)
        return snap_id

    def read(self, version: int | None = None) -> DataFrame:
        """Current snapshot, or time travel to ``version``."""
        snap_id = version if version is not None else self._head()
        if snap_id is None:
            raise FileNotFoundError(f"table {self.path} has no snapshots")
        m = self._manifest(snap_id)
        return self.spark.read.parquet(*m["files"])

    def history(self) -> list[dict]:
        out = []
        snap = self._head()
        while snap is not None:
            m = self._manifest(snap)
            out.append(m)
            snap = m["parent"]
        return out

    def rollback(self, version: int) -> None:
        """Point HEAD at an earlier snapshot (its manifest must exist);
        later snapshots stay readable by explicit version."""
        self._manifest(version)  # raises if unknown
        self._flip_head(version)

    def expire_snapshots(self) -> list[int]:
        """Iceberg-style `expire_snapshots`: delete manifests NOT in the
        ancestry of HEAD, plus any data directory no surviving manifest
        references.  Returns the expired snapshot ids.  HEAD's full
        ancestry always survives (time travel along the current line
        stays intact); orphan lines — snapshots stranded by a
        rollback-then-commit — are collected."""
        import shutil

        head = self._head()
        if head is None:
            return []
        live = {m["id"] for m in self.history()}
        all_ids = {
            int(n[:-5])
            for n in os.listdir(self.manifest_dir)
            if n.endswith(".json") and n[:-5].isdigit()
        }
        doomed = sorted(all_ids - live)
        live_files: set[str] = set()
        for sid in live:
            live_files.update(self._manifest(sid)["files"])
        for sid in doomed:
            dead = [
                f for f in self._manifest(sid)["files"]
                if f not in live_files
            ]
            os.remove(os.path.join(self.manifest_dir, f"{sid}.json"))
            for d in dead:
                # a dead dir may still be referenced by another doomed
                # manifest; harmless — the first remover wins
                shutil.rmtree(d, ignore_errors=True)
        return doomed
