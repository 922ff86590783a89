"""Staged pipeline driver — checkpointed, resumable, metered.

The reference achieves durability with end-to-end acks: sink delivery
status propagates back to source offset commits via event finalizers
(/root/reference/lib/vector-common/src/finalization.rs:179-320) and
disk buffers (/root/reference/lib/vector-buffers/src/variants/disk_v2/).
The batch-engine re-expression: every stage's output is an idempotent
atomic table write (parquet `_SUCCESS` marker; Iceberg snapshot commit
on a real cluster), and a MANIFEST records per-stage lineage +
row-count + per-partition metrics.  A rerun skips every stage whose
output already committed — resume-from-checkpoint for free, with
at-least-once stage execution and exactly-once visible output.

The DAG spec is data (name → stage fn + parents), mirroring Vector's
config graph (src/config/compiler.rs builds a component DAG from
`inputs` lists); cycles are rejected the same way graph.rs:269-318 does.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class Stage:
    """One pipeline stage: pure function of its parent frames."""

    name: str
    fn: Callable[..., DataFrame]  # (spark, *parent_dfs) -> DataFrame
    parents: list[str] = field(default_factory=list)
    #: skip checkpointing (cheap projections); downstream reads recompute
    materialize: bool = True


class PipelineGraphError(ValueError):
    pass


class Pipeline:
    def __init__(
        self,
        stages: list[Stage],
        checkpoint_dir: str,
        inputs: list[str] = (),
    ):
        self.stages = {s.name: s for s in stages}
        if len(self.stages) != len(stages):
            raise PipelineGraphError("duplicate stage names")
        self.inputs = list(inputs)
        self.order = self._toposort(stages)
        self.checkpoint_dir = checkpoint_dir
        self.manifest_path = os.path.join(checkpoint_dir, "MANIFEST.jsonl")

    def _toposort(self, stages: list[Stage]) -> list[str]:
        """Kahn topo-sort; rejects cycles and unknown parents
        (the graph.rs:269-318 analogue)."""
        names = {s.name for s in stages}
        external = set(self.inputs)
        for s in stages:
            unknown = set(s.parents) - names - external
            if unknown:
                raise PipelineGraphError(f"{s.name}: unknown inputs {unknown}")
        indeg = {
            s.name: len([p for p in s.parents if p not in external])
            for s in stages
        }
        children: dict[str, list[str]] = {s.name: [] for s in stages}
        for s in stages:
            for p in s.parents:
                if p not in external:
                    children[p].append(s.name)
        ready = sorted(n for n, d in indeg.items() if d == 0)
        out: list[str] = []
        while ready:
            n = ready.pop(0)
            out.append(n)
            for c in children[n]:
                indeg[c] -= 1
                if indeg[c] == 0:
                    ready.append(c)
            ready.sort()
        if len(out) != len(stages):
            raise PipelineGraphError("cycle detected in pipeline graph")
        return out

    # -- checkpoint bookkeeping ------------------------------------------

    def _stage_path(self, name: str) -> str:
        return os.path.join(self.checkpoint_dir, name)

    def _committed(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._stage_path(name), "_SUCCESS"))

    def _append_manifest(self, rec: dict) -> None:
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        with open(self.manifest_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def manifest(self) -> list[dict]:
        if not os.path.exists(self.manifest_path):
            return []
        with open(self.manifest_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    # -- execution -------------------------------------------------------

    def run(
        self,
        spark: SparkSession,
        inputs: dict[str, DataFrame] | None = None,
        *,
        resume: bool = True,
    ) -> dict[str, DataFrame]:
        """Execute every stage in topo order.

        ``inputs``: externally-provided source frames, addressable as
        parents.  Returns {stage_name: DataFrame} (checkpointed stages
        read back from their committed output — stable lineage for
        downstream stages and for inspection).
        """
        inputs = inputs or {}
        results: dict[str, DataFrame] = dict(inputs)
        for name in self.order:
            stage = self.stages[name]
            path = self._stage_path(name)
            if resume and stage.materialize and self._committed(name):
                results[name] = spark.read.parquet(path)
                self._append_manifest(
                    {"stage": name, "event": "resume_skip", "path": path,
                     "ts": time.time()}
                )
                continue
            parent_dfs = [results[p] for p in stage.parents]
            t0 = time.perf_counter()
            df = stage.fn(spark, *parent_dfs)
            if stage.materialize:
                # a previous driver killed mid-write leaves a partial
                # dir (no _SUCCESS); clear it so the rewrite starts
                # clean.  NOTE single-writer discipline: the previous
                # driver process (and its JVM) must be fully dead
                # before resuming — two concurrent writers race on the
                # _temporary commit dir.
                if os.path.exists(path) and not self._committed(name):
                    import shutil

                    shutil.rmtree(path, ignore_errors=True)
                df.write.mode("overwrite").parquet(path)
                out = spark.read.parquet(path)
                stats = (
                    out.groupBy(F.spark_partition_id().alias("pid"))
                    .count()
                    .collect()
                )
                per_part = {int(r["pid"]): int(r["count"]) for r in stats}
                self._append_manifest(
                    {
                        "stage": name,
                        "event": "commit",
                        "path": path,
                        "parents": stage.parents,
                        "rows": sum(per_part.values()),
                        "partitions": per_part,
                        "wall_s": round(time.perf_counter() - t0, 3),
                        "ts": time.time(),
                    }
                )
                results[name] = out
            else:
                results[name] = df
                self._append_manifest(
                    {"stage": name, "event": "lazy", "parents": stage.parents,
                     "ts": time.time()}
                )
        return results

    def invalidate(self, *names: str) -> None:
        """Drop committed outputs AND every transitive descendant —
        a committed child left in place would be resumed as-is on the
        next run and silently serve results computed from the OLD
        parent (stale lineage)."""
        import shutil

        children: dict[str, list[str]] = {n: [] for n in self.stages}
        for s in self.stages.values():
            for p in s.parents:
                if p in children:
                    children[p].append(s.name)
        doomed: set[str] = set()
        frontier = list(names)
        while frontier:
            n = frontier.pop()
            if n in doomed:
                continue
            doomed.add(n)
            frontier.extend(children.get(n, []))
        for n in doomed:
            shutil.rmtree(self._stage_path(n), ignore_errors=True)


def add_lineage(df: DataFrame, source: str, stage: str) -> DataFrame:
    """Explicit lineage columns (_source, _stage) — the relational
    rendering of EventMetadata.source_id/upstream_id
    (/root/reference/lib/vector-core/src/event/metadata.rs)."""
    return df.withColumn("_source", F.lit(source)).withColumn(
        "_stage", F.lit(stage)
    )
