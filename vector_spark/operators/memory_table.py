"""Memory enrichment table — a WRITABLE lookup table the pipeline
itself populates, with TTL expiry and a size cap.

Reference: the `memory` enrichment table
(/root/reference/src/enrichment_tables/memory/config.rs:34-78,
table.rs:58-235): events written into a key→object map; the latest
write per key wins and resets the TTL; entries older than ``ttl`` are
expired on scan; inserts that would push the table past
``max_byte_size`` are REJECTED (the old state is kept); readers look
rows up by key.

Batch re-expression over :class:`~vector_spark.sources.table.SnapshotTable`:

- ``write(df)`` appends (key cols, value cols, _written_ts) as an
  atomic snapshot commit — the durable analogue of the in-memory map
  (flush_interval collapses to "visible at commit").
- ``state(as_of)`` reconstructs the map as of an event time: latest
  write per key with ``as_of - _written_ts <= ttl``.  Event-time,
  so results are deterministic and oracle-checkable (the reference's
  wall-clock `Instant` scans cannot be).
- ``lookup(events, as_of)`` broadcast-joins the (small) state onto the
  fact side — same plan shape as the static enrichment tables.
- per-row TTL override via ``ttl_col`` mirrors config.rs `ttl_field`.

Scale: the fact side never shuffles (broadcast state); the state
reconstruction shuffles only writes (dimension-sized).  One snapshot
read + one window per lookup.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from vector_spark.sources.table import SnapshotTable


class TableFullError(RuntimeError):
    """max_byte_size exceeded: the insert batch was rejected
    (memory/table.rs:205-218 keeps the previous state)."""


class MemoryTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        *,
        ttl_sec: int = 600,
        ttl_col: str | None = None,
        max_byte_size: int | None = None,
        tiebreak_cols: list[str] | None = None,
    ):
        self.spark = spark
        self.key_cols = list(key_cols)
        self.ttl_sec = ttl_sec
        self.ttl_col = ttl_col
        self.max_byte_size = max_byte_size
        #: deterministic winner among same-timestamp writes to one key
        #: (the reference's arrival order has no batch analogue)
        self.tiebreak_cols = list(tiebreak_cols or [])
        self._table = SnapshotTable(spark, path)

    # -- writes ----------------------------------------------------------

    def write(self, df: DataFrame, *, written_ts_col: str = "ts") -> int:
        """Append a batch of writes; each row (re)sets its key's value
        and TTL at its ``written_ts_col`` event time.  Returns the
        snapshot id.  Raises :class:`TableFullError` if the cap would
        be exceeded (state unchanged)."""
        staged = df.withColumn("_written_ts", F.col(written_ts_col))
        snap_id = self._table.commit(staged, mode="append")
        if self.max_byte_size is not None:
            total = self._data_bytes()
            if total > self.max_byte_size:
                # reject: roll HEAD back to the parent snapshot
                manifest = self._table._manifest(snap_id)
                parent = manifest["parent"]
                if parent is not None:
                    self._table.rollback(parent)
                else:
                    os.remove(
                        os.path.join(
                            self._table.manifest_dir, f"{snap_id}.json"
                        )
                    )
                    os.remove(self._table.head_path)
                raise TableFullError(
                    f"insert rejected: table would be {total} bytes "
                    f"(max {self.max_byte_size})"
                )
        return snap_id

    def _data_bytes(self) -> int:
        m = self._table._manifest(self._table._head())
        total = 0
        for d in m["files"]:
            for n in os.listdir(d):
                if n.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(d, n))
        return total

    # -- reads -----------------------------------------------------------

    def _latest(self, as_of: Column | str):
        as_of_c = F.lit(as_of).cast("timestamp") if isinstance(as_of, str) else as_of
        df = self._table.read().filter(F.col("_written_ts") <= as_of_c)
        value_cols = [c for c in df.columns if c not in self.key_cols]
        ord_key = F.struct(
            F.col("_written_ts"), *[F.col(c) for c in self.tiebreak_cols]
        )
        latest = (
            df.groupBy(*self.key_cols)
            .agg(
                F.max_by(
                    F.struct(*[F.col(c) for c in value_cols]), ord_key
                ).alias("_v")
            )
            .select(*self.key_cols, "_v.*")
        )
        ttl = (
            F.col(self.ttl_col).cast("long")
            if self.ttl_col
            else F.lit(self.ttl_sec)
        )
        age = F.unix_timestamp(as_of_c) - F.unix_timestamp(F.col("_written_ts"))
        return latest, age, ttl

    def state(self, as_of: Column | str) -> DataFrame:
        """The key→value map as of event time ``as_of``: latest
        non-expired write per key.  This is also the memory table's
        SOURCE surface — the reference can export its items as events
        on an interval (memory/source.rs `export_table_items`); a batch
        export is this frame at the chosen as-of.

        Last-write-wins is a ``max_by`` AGGREGATION, not a
        partitionBy(key) window: enrichment keys are low-cardinality by
        nature, and a window would shuffle EVERY write of a hot key to
        one task; max_by partial-aggregates map-side so only one
        candidate row per key per partition reaches the shuffle."""
        latest, age, ttl = self._latest(as_of)
        return latest.filter(age <= ttl)

    def expired(self, as_of: Column | str) -> DataFrame:
        """Entries whose TTL had lapsed by ``as_of`` — the batch
        rendering of the reference's expired-entry export
        (memory/source.rs `export_expired_entries`: entries removed by
        TTL are emitted as events instead of dropped silently)."""
        latest, age, ttl = self._latest(as_of)
        return latest.filter(age > ttl)

    def lookup(
        self,
        events: DataFrame,
        as_of: Column | str,
        *,
        how: str = "left",
    ) -> DataFrame:
        """Enrich ``events`` with the table state (broadcast hash join
        on the key columns — the fact side never shuffles)."""
        state = self.state(as_of).drop("_written_ts")
        return events.join(F.broadcast(state), on=self.key_cols, how=how)
