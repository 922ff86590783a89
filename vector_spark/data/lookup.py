"""`tool_lookup` enrichment table (FIXTURES.md F2).

Mirrors the reference's CSV file enrichment table semantics
(/root/reference/src/enrichment_tables/file.rs:69-230): a small typed
lookup keyed on (tool, role) with a validity date range, exactly one row
per key — the single-row contract of
/root/reference/lib/vector-vrl/enrichment/src/lib.rs:53-57.

Defined as a portable VALUES SQL so the DuckDB oracle joins the exact
same rows.  In production this would be a dimension table loaded once
and broadcast to executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_TOOLS = ["search", "python", "browser", "sql", "none"]
_ROLES = ["user", "assistant", "tool", "system"]
_TEAM = {
    "search": "retrieval",
    "python": "codegen",
    "browser": "web",
    "sql": "data",
    "none": "core",
}


def _rows() -> list[tuple[str, str, str, float, str, str]]:
    out = []
    for ti, tool in enumerate(_TOOLS):
        for ri, role in enumerate(_ROLES):
            # deterministic fixed weight per (tool, role)
            w = round(0.5 + 0.25 * ti + 0.1 * ri, 2)
            out.append((tool, role, _TEAM[tool], w, "2026-01-01", "2026-12-31"))
    return out


def _values_sql(ts_cast: str) -> str:
    vals = ",\n  ".join(
        f"('{t}', '{r}', '{team}', CAST({w} AS DOUBLE), "
        f"{ts_cast.format(v=vf)}, {ts_cast.format(v=vt)})"
        for t, r, team, w, vf, vt in _rows()
    )
    return (
        "SELECT * FROM (VALUES\n  " + vals + "\n) AS tool_lookup"
        "(tool, role, team, cost_weight, valid_from, valid_to)"
    )


#: Spark SQL — `VALUES` with column aliases
TOOL_LOOKUP_SQL = _values_sql("CAST('{v} 00:00:00' AS TIMESTAMP)")

#: DuckDB — identical shape
TOOL_LOOKUP_DUCKDB_SQL = _values_sql("TIMESTAMP '{v} 00:00:00'")


def tool_lookup_cte() -> str:
    return f"tool_lookup AS (\n{TOOL_LOOKUP_DUCKDB_SQL}\n)"


def tool_lookup_df(spark: SparkSession) -> DataFrame:
    return spark.sql(TOOL_LOOKUP_SQL)
