"""VRL metrics-query functions — get/find/aggregate over the engine's
OWN telemetry.

Reference: `get_vector_metric` / `find_vector_metrics` /
`aggregate_vector_metrics` over an internal MetricsStorage cache
(/root/reference/lib/vector-vrl/metrics/src/common.rs:47-73,
get_vector_metric.rs:38-102, aggregate_vector_metrics.rs:17-77 —
functions sum|avg|min|max, tag filters are subset matches).

Batch analogue: the telemetry source is the checkpointed Pipeline's
manifest (plans/driver.py emits per-stage rows, per-partition
histograms, and wall time), refreshed into a driver-side cache.  Like
the reference these resolve at the driver (the VRL program reads a
point-in-time snapshot, common.rs refresh_metrics); `as_df` exposes
the same cache as a DataFrame for distributed joins.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession


class MetricsStorage:
    def __init__(self) -> None:
        self._cache: list[dict] = []

    # -- refresh ---------------------------------------------------------

    def load(self, metrics: list[dict]) -> None:
        """Replace the cache (the ArcSwap store analogue)."""
        self._cache = list(metrics)

    def refresh_from_pipeline(self, pipeline) -> None:
        """Pull per-stage metrics from a Pipeline's commit manifest:
        utilization-style gauges (wall seconds), row counters, and
        partition counts per component_id."""
        metrics: list[dict] = []
        for rec in pipeline.manifest():
            if rec.get("event") != "commit":
                continue
            tags = {"component_id": rec["stage"]}
            metrics.append({
                "name": "stage_rows_total", "tags": tags, "type": "counter",
                "kind": "absolute", "value": float(rec["rows"]),
            })
            metrics.append({
                "name": "stage_wall_seconds", "tags": tags, "type": "gauge",
                "kind": "absolute", "value": float(rec["wall_s"]),
            })
            metrics.append({
                "name": "stage_partitions", "tags": tags, "type": "gauge",
                "kind": "absolute",
                "value": float(len(rec.get("partitions", {}))),
            })
        self._cache = metrics

    # -- queries (tag filters are SUBSET matches, common.rs:55-60) -------

    def _matches(self, m: dict, name: str, tags: dict | None) -> bool:
        if m["name"] != name:
            return False
        mtags = m.get("tags", {})
        return all(mtags.get(k) == v for k, v in (tags or {}).items())

    def get_metric(self, name: str, tags: dict | None = None) -> dict | None:
        """First matching metric, or None (get_vector_metric)."""
        for m in self._cache:
            if self._matches(m, name, tags):
                return m
        return None

    def find_metrics(self, name: str, tags: dict | None = None) -> list[dict]:
        """All matching metrics (find_vector_metrics)."""
        return [m for m in self._cache if self._matches(m, name, tags)]

    def aggregate_metrics(
        self, function: str, name: str, tags: dict | None = None
    ) -> float | None:
        """sum|avg|min|max over matching counter/gauge values
        (aggregate_vector_metrics.rs:62-68; empty match → None)."""
        vals = [
            m["value"]
            for m in self.find_metrics(name, tags)
            if m.get("type") in ("counter", "gauge")
        ]
        if not vals:
            return None
        if function == "sum":
            return sum(vals)
        if function == "avg":
            return sum(vals) / len(vals)
        if function == "min":
            return min(vals)
        if function == "max":
            return max(vals)
        raise ValueError(f"unknown aggregation {function!r} "
                         "(expected sum|avg|min|max)")

    def as_df(self, spark: SparkSession) -> DataFrame:
        """The cache as a DataFrame — joinable telemetry."""
        rows: list[tuple[Any, ...]] = [
            (m["name"], m.get("tags", {}), m.get("type"), m.get("kind"),
             float(m["value"]))
            for m in self._cache
        ]
        return spark.createDataFrame(
            rows,
            "name string, tags map<string,string>, type string, "
            "kind string, value double",
        )


#: default storage, mirroring the reference's process-wide Controller
_STORAGE = MetricsStorage()


def get_vector_metric(name: str, tags: dict | None = None) -> dict | None:
    return _STORAGE.get_metric(name, tags)


def find_vector_metrics(name: str, tags: dict | None = None) -> list[dict]:
    return _STORAGE.find_metrics(name, tags)


def aggregate_vector_metrics(
    function: str, name: str, tags: dict | None = None
) -> float | None:
    return _STORAGE.aggregate_metrics(function, name, tags)


def default_storage() -> MetricsStorage:
    return _STORAGE
