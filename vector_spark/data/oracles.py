"""DuckDB SQL fragments mirroring the library's operators — the oracle
side of the driver's correctness gate.

Each fragment must be semantically identical to the Spark implementation
(same column names, same null behavior).  Regex constants are shared
with vector_spark.functions.parse so the two sides can't drift.
"""

from __future__ import annotations

from vector_spark.data.lookup import TOOL_LOOKUP_DUCKDB_SQL
from vector_spark.data.transcripts import duckdb_transcripts_sql
from vector_spark.functions.parse import (
    APACHE_ANCHORED,
    APACHE_FIELDS,
    LOGFMT_CODE,
    LOGFMT_LEVEL,
    LOGFMT_MSG,
    LOGFMT_RETRY,
)


def _ap(field: str) -> str:
    """DuckDB expr for one apache capture group (1-indexed)."""
    i = APACHE_FIELDS.index(field) + 1
    return f"nullif(regexp_extract(text, '{APACHE_ANCHORED}', {i}), '')"


#: SELECT-list fragments producing the flattened `parsed` struct fields.
#: Assumes a relation exposing `text` (gate: apache regex > json > logfmt).
def parsed_fields_sql() -> str:
    is_ap = f"regexp_matches(text, '{APACHE_ANCHORED}')"
    is_js = "starts_with(text, '{\"')"
    is_lf = "starts_with(text, 'level=')"
    return f"""
    CASE WHEN {is_ap} THEN 'apache' WHEN {is_js} THEN 'json'
         WHEN {is_lf} THEN 'logfmt' END AS format,
    CASE WHEN {is_ap} THEN {_ap('client_ip')} END AS client_ip,
    CASE WHEN {is_ap} THEN {_ap('username')} END AS username,
    CASE WHEN {is_ap} THEN {_ap('log_time')} END AS log_time,
    CASE WHEN {is_ap} THEN {_ap('http_method')} END AS http_method,
    CASE WHEN {is_ap} THEN {_ap('http_url')} END AS http_url,
    CAST(CASE WHEN {is_ap} THEN {_ap('http_status')} END AS INTEGER) AS http_status,
    CAST(CASE WHEN {is_ap} THEN {_ap('http_bytes')} END AS BIGINT) AS http_bytes,
    CASE WHEN {is_js} THEN json_extract_string(text, '$.level')
         WHEN {is_lf} THEN nullif(regexp_extract(text, '{LOGFMT_LEVEL}', 1), '')
         END AS level,
    CASE WHEN {is_js} THEN json_extract_string(text, '$.msg')
         WHEN {is_lf} THEN nullif(regexp_extract(text, '{LOGFMT_MSG}', 1), '')
         END AS msg,
    CAST(CASE WHEN {is_js} THEN json_extract_string(text, '$.latency_ms') END AS BIGINT) AS latency_ms,
    CASE WHEN {is_js} THEN json_extract_string(text, '$.service') END AS service,
    CASE WHEN {is_lf} THEN nullif(regexp_extract(text, '{LOGFMT_CODE}', 1), '') END AS code,
    CASE WHEN {is_lf} THEN regexp_extract(text, '{LOGFMT_RETRY}', 1) = 'true' END AS retry,
    ({is_ap} OR {is_js} OR {is_lf}) AS parse_ok
    """


def transcripts_cte(n_turns: int, *, with_lookup: bool = False) -> str:
    """``WITH transcripts AS (...) [, tool_lookup AS (...)]`` prefix."""
    parts = [f"transcripts AS (\n{duckdb_transcripts_sql(n_turns)}\n)"]
    if with_lookup:
        parts.append(f"tool_lookup AS (\n{TOOL_LOOKUP_DUCKDB_SQL}\n)")
    return "WITH " + ",\n".join(parts)


def parsed_cte(n_turns: int, *, with_lookup: bool = False) -> str:
    """CTE chain ending in `parsed`: transcripts + flattened parse fields."""
    return (
        transcripts_cte(n_turns, with_lookup=with_lookup)
        + f""",
parsed AS (
  SELECT conv_id, turn_idx, role, text, tool, ts,
  {parsed_fields_sql()}
  FROM transcripts
)"""
    )
