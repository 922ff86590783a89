"""Driver-contract queries: one entry per implemented operator, each
paired with an ANSI-SQL DuckDB oracle over the same inputs.

Spark side: library operators over the synthesized transcripts table
(vector_spark.data.transcripts) or the driver-provided parquet tables.
Oracle side: equivalent SQL; transcript queries prepend the portable
generator CTE at the driver's compare scale (sf0.01 → 60_000 turns).

Column names are aliased identically on both sides — the driver's
compare sorts columns by name before hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from vector_spark.data.oracles import parsed_cte, transcripts_cte
from vector_spark.data.transcripts import load_transcripts
from vector_spark.operators import (
    aggregate,
    context_window,
    dedupe,
    diff,
    exclusive_route,
    incremental_to_absolute,
    log_to_metric,
    reduce_events,
    route,
    sample_mod,
    sessionize,
    tag_cardinality_limit,
    throttle,
)
from vector_spark.plans.transcript_pipeline import (
    ROUTE_CONDS,
    enriched_transcripts,
)

from vector_spark.registry import (  # noqa: F401
    _REGISTRY,
    QueryFn,
    oracle_sql,
    queries,
    register,
)

#: the driver compares at sf0.01
N_ORACLE = 60_000

#: DuckDB rendering of the portable md5-prefix 60-bit hash
_H60_SQL = "try_cast(concat('0x', substr(md5({e}), 1, 15)) AS BIGINT)"


# ---------------------------------------------------------------------------
# helpers

_FLAT_COLS = (
    "conv_id, turn_idx, role, tool, ts, format, client_ip, username, "
    "log_time, http_method, http_url, http_status, http_bytes, level, "
    "msg, latency_ms, service, code, retry"
)


def _enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    out, _ = enriched_transcripts(spark, load_transcripts(spark, sf_dir))
    return out


_ENRICH_CTE = (
    parsed_cte(N_ORACLE, with_lookup=True)
    + """,
enriched AS (
  SELECT p.*, l.team, l.cost_weight
  FROM parsed p LEFT JOIN tool_lookup l USING (tool, role)
  WHERE p.parse_ok
)"""
)


# ---------------------------------------------------------------------------
# parse / remap


@register(
    "parse_extract",
    parsed_cte(N_ORACLE)
    + f"\nSELECT {_FLAT_COLS}, parse_ok FROM parsed",
)
def q_parse_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_spark.functions.parse import parse_transcripts

    df = parse_transcripts(load_transcripts(spark, sf_dir))
    return df.select(
        "conv_id", "turn_idx", "role", "tool", "ts", "format", "parsed.*",
        "parse_ok",
    )


@register(
    "parse_dropped",
    parsed_cte(N_ORACLE)
    + "\nSELECT conv_id, turn_idx, text, 'parse_error' AS _dropped_reason "
    "FROM parsed WHERE NOT parse_ok",
)
def q_parse_dropped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_spark.functions.parse import parse_transcripts, split_errors

    _, dropped = split_errors(parse_transcripts(load_transcripts(spark, sf_dir)))
    return dropped.select("conv_id", "turn_idx", "text", "_dropped_reason")


@register(
    "turns_stable_order",
    transcripts_cte(N_ORACLE)
    + """
SELECT conv_id, turn_idx, text,
       row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS stable_pos
FROM transcripts""",
)
def q_turns_stable_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-turn TEXT equality under stable (conv_id, turn_idx) ordering —
    the north rule's row-level gate, as an explicit driver query."""
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    return load_transcripts(spark, sf_dir).select(
        "conv_id", "turn_idx", "text",
        (F.row_number().over(w) - 1).alias("stable_pos"),
    )


# ---------------------------------------------------------------------------
# enrich


@register(
    "enrich_lookup",
    _ENRICH_CTE
    + "\nSELECT conv_id, turn_idx, tool, role, team, cost_weight FROM enriched",
)
def q_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _enriched(spark, sf_dir).select(
        "conv_id", "turn_idx", "tool", "role", "team", "cost_weight"
    )


#: synthetic IP-range "geo" table: /8 blocks with labels (VALUES SQL so
#: the oracle joins identical rows)
_IP_RANGES = [
    (10 * 16777216, 11 * 16777216 - 1, "net-a"),
    (11 * 16777216, 64 * 16777216 - 1, "net-b"),
    (64 * 16777216, 128 * 16777216 - 1, "net-c"),
]
_IP_RANGES_SQL = "SELECT * FROM (VALUES " + ", ".join(
    f"({lo}, {hi}, '{lab}')" for lo, hi, lab in _IP_RANGES
) + ") AS ip_ranges(ip_lo, ip_hi, net)"


@register(
    "enrich_ip_ranges",
    _ENRICH_CTE
    + f""",
ip_ranges AS ({_IP_RANGES_SQL}),
ips AS (
  SELECT conv_id, turn_idx,
         CAST(string_split(client_ip, '.')[1] AS BIGINT) * 16777216
         + CAST(string_split(client_ip, '.')[2] AS BIGINT) * 65536
         + CAST(string_split(client_ip, '.')[3] AS BIGINT) * 256
         + CAST(string_split(client_ip, '.')[4] AS BIGINT) AS ip
  FROM enriched WHERE client_ip IS NOT NULL
)
SELECT r.net, count(*) AS n
FROM ips i LEFT JOIN ip_ranges r ON i.ip BETWEEN r.ip_lo AND r.ip_hi
GROUP BY r.net""",
)
def q_enrich_ip_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geoip-style range-join enrichment (bucketed hash-join path)."""
    from vector_spark.enrich import enrich_ip_ranges

    ranges = spark.createDataFrame(_IP_RANGES, "ip_lo long, ip_hi long, net string")
    fact = _enriched(spark, sf_dir).filter(F.col("client_ip").isNotNull())
    out = enrich_ip_ranges(fact, ranges, "client_ip")
    return out.groupBy("net").agg(F.count(F.lit(1)).alias("n"))


@register(
    "memory_enrich_ttl",
    _ENRICH_CTE
    + """,
writes AS (
  SELECT service, level AS cur_level, ts, conv_id, turn_idx
  FROM enriched WHERE format = 'json' AND service IS NOT NULL
),
mx AS (SELECT max(ts) AS as_of FROM writes),
ranked AS (
  SELECT w.*, row_number() OVER (
    PARTITION BY service ORDER BY ts DESC, conv_id DESC, turn_idx DESC
  ) AS rn
  FROM writes w
),
state AS (
  SELECT r.service, r.cur_level
  FROM ranked r, mx
  WHERE rn = 1
    AND CAST(floor(epoch(as_of)) AS BIGINT)
        - CAST(floor(epoch(ts)) AS BIGINT) <= 1800
)
SELECT e.service, s.cur_level, CAST(count(*) AS BIGINT) AS n
FROM writes e LEFT JOIN state s USING (service)
GROUP BY e.service, s.cur_level""",
)
def q_memory_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writable memory enrichment table with TTL
    (src/enrichment_tables/memory/config.rs:34-78): the pipeline WRITES
    per-service status rows into the table, then the same event stream
    looks its service's current (non-expired, last-write-wins) status
    back up — 'pipeline writes the table it later joins against'."""
    import os
    import shutil

    from vector_spark.operators.memory_table import MemoryTable

    path = f"/tmp/vector_spark_memtbl_query/{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(path, ignore_errors=True)
    writes = (
        _enriched(spark, sf_dir)
        .filter((F.col("format") == "json") & F.col("service").isNotNull())
        .select(
            "service", F.col("level").alias("cur_level"), "ts",
            "conv_id", "turn_idx",
        )
    )
    tbl = MemoryTable(
        spark, path, ["service"], ttl_sec=1800,
        tiebreak_cols=["conv_id", "turn_idx"],
    )
    tbl.write(writes)
    as_of = writes.agg(F.max("ts")).first()[0]
    events = writes.select("service")
    out = tbl.lookup(events, F.lit(as_of))
    return out.groupBy("service", "cur_level").agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# route (non-exclusive) — one row-level query per sink + count parity


def _route_sink(name: str) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        sinks = route(
            _enriched(spark, sf_dir),
            ROUTE_CONDS,
        )
        df = sinks[name if name != "unmatched" else "_unmatched"]
        return df.select("conv_id", "turn_idx", "role", "tool")

    return fn


def _route_oracle(cond: str) -> str:
    return (
        _ENRICH_CTE
        + f"\nSELECT conv_id, turn_idx, role, tool FROM enriched WHERE {cond}"
    )


_UNMATCHED_COND = " AND ".join(
    f"NOT coalesce({v}, false)" for v in ROUTE_CONDS.values()
)

for _name, _cond in ROUTE_CONDS.items():
    register(f"route_{_name}", _route_oracle(_cond))(_route_sink(_name))
register("route_unmatched", _route_oracle(_UNMATCHED_COND))(
    _route_sink("unmatched")
)


@register(
    "route_counts",
    _ENRICH_CTE
    + "".join(
        f"""
, c_{name} AS (SELECT '{name}' AS sink, count(*) AS n FROM enriched WHERE {cond})"""
        for name, cond in ROUTE_CONDS.items()
    )
    + f"""
, c_unmatched AS (SELECT '_unmatched' AS sink, count(*) AS n FROM enriched WHERE {_UNMATCHED_COND})
SELECT * FROM c_sink_errors UNION ALL SELECT * FROM c_sink_tools
UNION ALL SELECT * FROM c_sink_slow UNION ALL SELECT * FROM c_sink_assistant
UNION ALL SELECT * FROM c_unmatched""",
)
def q_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sink count parity — the north rule's headline check."""
    enriched = _enriched(spark, sf_dir)
    sinks = route(enriched, ROUTE_CONDS)
    parts = [
        s.groupBy().agg(F.count(F.lit(1)).alias("n")).select(F.lit(name).alias("sink"), "n")
        for name, s in sinks.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "exclusive_route_counts",
    _ENRICH_CTE
    + f"""
SELECT CASE WHEN {ROUTE_CONDS['sink_errors']} THEN 'sink_errors'
            WHEN {ROUTE_CONDS['sink_tools']} THEN 'sink_tools'
            WHEN {ROUTE_CONDS['sink_slow']} THEN 'sink_slow'
            WHEN {ROUTE_CONDS['sink_assistant']} THEN 'sink_assistant'
            ELSE '_unmatched' END AS _route,
       count(*) AS n
FROM enriched GROUP BY 1""",
)
def q_exclusive_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = exclusive_route(
        _enriched(spark, sf_dir),
        list(ROUTE_CONDS.items()),
    )
    return df.groupBy("_route").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# aggregate (windowed, per sink_errors subset) + diff


_AGG_SQL = """
SELECT make_timestamp(((floor(epoch(ts))::BIGINT // 60) * 60) * 1000000) AS window_start,
       count(*) AS n,
       CAST(sum(http_bytes) AS BIGINT) AS sum_bytes,
       CAST(sum(latency_ms) AS BIGINT) AS sum_latency,
       min(latency_ms) AS min_latency,
       max(latency_ms) AS max_latency,
       count(DISTINCT conv_id) AS n_convs
FROM enriched WHERE {cond}
GROUP BY 1
"""


@register(
    "aggregate_errors_1m",
    _ENRICH_CTE + _AGG_SQL.format(cond=ROUTE_CONDS["sink_errors"]),
)
def q_aggregate_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    sinks = route(
        _enriched(spark, sf_dir), ROUTE_CONDS
    )
    return aggregate(
        sinks["sink_errors"],
        keys=[],
        specs={
            "n": ("count", "*"),
            "sum_bytes": ("sum", "http_bytes"),
            "sum_latency": ("sum", "latency_ms"),
            "min_latency": ("min", "latency_ms"),
            "max_latency": ("max", "latency_ms"),
            "n_convs": ("count_distinct", "conv_id"),
        },
        ts_col="ts",
        interval_sec=60,
    )


@register(
    "aggregate_by_role_diff",
    _ENRICH_CTE
    + """,
w AS (
  SELECT role,
         make_timestamp(((floor(epoch(ts))::BIGINT // 3600) * 3600) * 1000000) AS window_start,
         count(*) AS n
  FROM enriched GROUP BY 1, 2
)
SELECT role, window_start, n,
       n - lag(n) OVER (PARTITION BY role ORDER BY window_start) AS n_diff
FROM w""",
)
def q_aggregate_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = aggregate(
        _enriched(spark, sf_dir),
        keys=["role"],
        specs={"n": ("count", "*")},
        ts_col="ts",
        interval_sec=3600,
    )
    return diff(agg, ["role"], "n")


_AGG_BODY = """
SELECT make_timestamp(((floor(epoch(ts))::BIGINT // 60) * 60) * 1000000) AS window_start,
       count(*) AS n,
       CAST(sum(http_bytes) AS BIGINT) AS sum_bytes,
       CAST(sum(latency_ms) AS BIGINT) AS sum_latency,
       min(latency_ms) AS min_latency,
       max(latency_ms) AS max_latency,
       count(DISTINCT conv_id) AS n_convs
FROM {tbl} WHERE {cond}
GROUP BY 1
"""

_STATS_SQL = (
    _ENRICH_CTE
    + "\n"
    + "\nUNION ALL\n".join(
        [
            f"SELECT '{name}' AS sink, * FROM ({_AGG_BODY.format(tbl='enriched', cond=cond)})"
            for name, cond in ROUTE_CONDS.items()
        ]
        + [
            f"SELECT '_unmatched' AS sink, * FROM ({_AGG_BODY.format(tbl='enriched', cond=_UNMATCHED_COND)})",
            "SELECT '_dropped' AS sink, * FROM ("
            + _AGG_BODY.format(tbl="parsed", cond="NOT parse_ok")
            + ")",
        ]
    )
)


@register("pipeline_stats", _STATS_SQL)
def q_pipeline_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole pipeline as one job: every sink + _unmatched + _dropped."""
    from vector_spark.plans.transcript_pipeline import pipeline_stats

    return pipeline_stats(spark, load_transcripts(spark, sf_dir))


_FUSED_SQL = _ENRICH_CTE + "\n" + "\nUNION ALL\n".join(
    f"SELECT '{name}' AS sink, * FROM ({_AGG_SQL.format(cond=cond)})"
    for name, cond in ROUTE_CONDS.items()
)


@register("pipeline_fused_agg", _FUSED_SQL)
def q_pipeline_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass all-sink aggregates (explode route tags, one shuffle)."""
    from vector_spark.plans.transcript_pipeline import fused_aggregates

    return fused_aggregates(_enriched(spark, sf_dir))


# ---------------------------------------------------------------------------
# reduce (transcript collapse) + sessionize


@register(
    "reduce_conversations",
    _ENRICH_CTE
    + """
SELECT conv_id,
       arg_min(text, turn_idx) AS first_text,
       string_agg(text, chr(10) ORDER BY turn_idx) AS all_text,
       count(*) AS n_turns,
       CAST(sum(latency_ms) AS BIGINT) AS sum_latency,
       string_agg(role, ',' ORDER BY turn_idx) AS roles,
       min(ts) AS ts,
       max(ts) AS ts_end
FROM enriched GROUP BY conv_id""",
)
def q_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    out, _ = enriched_transcripts(
        spark, load_transcripts(spark, sf_dir), flat=False
    )
    df = out.select(
        "conv_id", "turn_idx", "ts", "role", "text",
        F.col("parsed.latency_ms").alias("latency_ms"),
    )
    return reduce_events(
        df,
        group_by=["conv_id"],
        strategies={
            "first_text": ("discard", "text"),
            "all_text": ("concat_newline", "text"),
            "n_turns": ("count", "text"),
            "sum_latency": ("sum", "latency_ms"),
            "roles": ("concat", "role", ","),
        },
        ord_col="turn_idx",
    )


@register(
    "sessionize_counts",
    transcripts_cte(N_ORACLE)
    + """,
s AS (
  SELECT conv_id, ts,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
                OR epoch(ts) - lag(epoch(ts)) OVER w > 600 THEN 1 ELSE 0 END AS is_start
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
)
SELECT conv_id, CAST(sum(is_start) AS BIGINT) AS n_sessions
FROM s GROUP BY conv_id""",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = sessionize(
        load_transcripts(spark, sf_dir), ["conv_id"], gap_sec=600,
        tiebreak_cols=["turn_idx"],
    )
    return df.groupBy("conv_id").agg(
        (F.max("session_id") + 1).alias("n_sessions")
    )


@register(
    "reduce_sessions",
    transcripts_cte(N_ORACLE)
    + """,
s AS (
  SELECT conv_id, turn_idx, text, ts,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
                OR epoch(ts) - lag(epoch(ts)) OVER w > 600 THEN 1 ELSE 0 END AS is_start
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
),
sess AS (
  SELECT conv_id, turn_idx, text, ts,
         CAST(sum(is_start) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) - 1
           AS session_id
  FROM s
)
SELECT conv_id, session_id,
       count(*) AS n_turns,
       string_agg(text, chr(10) ORDER BY turn_idx) AS all_text,
       min(ts) AS ts, max(ts) AS ts_end
FROM sess GROUP BY conv_id, session_id""",
)
def q_reduce_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-scoped reduce: the reference's expire_after_ms flush —
    sessionize then merge per (conv, session)."""
    df = sessionize(load_transcripts(spark, sf_dir), ["conv_id"], gap_sec=600,
                    tiebreak_cols=["turn_idx"])
    return reduce_events(
        df,
        group_by=["conv_id", "session_id"],
        strategies={
            "n_turns": ("count", "text"),
            "all_text": ("concat_newline", "text"),
        },
        ord_col="turn_idx",
    )


@register(
    "datadog_search_counts",
    _ENRICH_CTE
    + """
SELECT
  CAST(count(CASE WHEN level = 'error' THEN 1 END) AS BIGINT) AS n_error,
  CAST(count(CASE WHEN http_status >= 500 THEN 1 END) AS BIGINT) AS n_5xx,
  CAST(count(CASE WHEN msg LIKE '%timeout%' THEN 1 END) AS BIGINT) AS n_timeout,
  CAST(count(CASE WHEN level = 'warn' AND retry THEN 1 END) AS BIGINT) AS n_warn_retry,
  CAST(count(CASE WHEN service IN ('auth', 'billing') THEN 1 END) AS BIGINT) AS n_svc
FROM enriched""",
)
def q_datadog_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datadog-search condition DSL compiled to Columns
    (src/conditions/datadog_search.rs) applied over the parsed stream:
    facet equality, numeric comparison, wildcard, boolean AND, OR."""
    from vector_spark.conditions_datadog import datadog_search

    df = _enriched(spark, sf_dir)
    conds = {
        "n_error": datadog_search("level:error"),
        "n_5xx": datadog_search("http_status:>=500"),
        "n_timeout": datadog_search("msg:*timeout*"),
        "n_warn_retry": datadog_search("level:warn AND retry:true"),
        "n_svc": datadog_search("service:auth OR service:billing"),
    }
    return df.agg(
        *[
            F.count(F.when(c, F.lit(1))).alias(name)
            for name, c in conds.items()
        ]
    )


@register(
    "parse_xml_roundtrip",
    transcripts_cte(N_ORACLE)
    + """
SELECT conv_id, turn_idx, turn_idx AS xid, role,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts_unix, tool
FROM transcripts""",
)
def q_parse_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VRL parse_xml via Spark 4 from_xml: each turn's metadata is
    rendered to an XML payload (attribute + nested elements) and parsed
    back; the oracle recovers the same fields directly, so a parse
    regression breaks the hash gate."""
    from vector_spark.functions.vrl import parse_xml

    t = load_transcripts(spark, sf_dir)
    xml = F.concat(
        F.lit('<turn id="'), F.col("turn_idx").cast("string"),
        F.lit('"><role>'), F.col("role"),
        F.lit("</role><ts>"), F.unix_timestamp("ts").cast("string"),
        F.lit("</ts><tool>"), F.col("tool"), F.lit("</tool></turn>"),
    )
    parsed = parse_xml(xml, "_id INT, role STRING, ts BIGINT, tool STRING")
    return t.select(
        "conv_id",
        "turn_idx",
        parsed.getField("_id").alias("xid"),
        parsed.getField("role").alias("role"),
        parsed.getField("ts").alias("ts_unix"),
        parsed.getField("tool").alias("tool"),
    )


@register(
    "redact_pii",
    transcripts_cte(N_ORACLE)
    + r"""
SELECT conv_id, turn_idx,
       regexp_replace(
         regexp_replace(text, '(?:\d{1,3}\.){3}\d{1,3}', '[REDACTED]', 'g'),
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[REDACTED]', 'g'
       ) AS clean
FROM transcripts""",
)
def q_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VRL redact with built-in filters (ipv4, email) over every turn —
    the PII-scrubbing remap a log pipeline runs before persisting."""
    from vector_spark.functions.vrl import redact

    return load_transcripts(spark, sf_dir).select(
        "conv_id", "turn_idx",
        redact(F.col("text"), ["ipv4", "email"]).alias("clean"),
    )


@register(
    "nginx_roundtrip",
    parsed_cte(N_ORACLE)
    + """
SELECT conv_id, turn_idx, client_ip AS client, http_status AS status,
       http_bytes AS size, concat('GET ', http_url, ' HTTP/1.1') AS request
FROM parsed WHERE format = 'apache'""",
)
def q_nginx_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_nginx_log: apache-format turns re-rendered as nginx
    'combined' lines, parsed back; the oracle recovers the fields
    directly, so the parser is under the hash gate."""
    from vector_spark.functions.parse import parse_transcripts
    from vector_spark.functions.vrl import parse_nginx_log

    df = parse_transcripts(load_transcripts(spark, sf_dir)).filter(
        F.col("format") == "apache"
    )
    line = F.concat(
        F.col("parsed.client_ip"), F.lit(" - "),
        F.coalesce(F.col("parsed.username"), F.lit("-")),
        F.lit(" ["), F.col("parsed.log_time"), F.lit('] "GET '),
        F.col("parsed.http_url"), F.lit(' HTTP/1.1" '),
        F.col("parsed.http_status").cast("string"), F.lit(" "),
        F.col("parsed.http_bytes").cast("string"),
        F.lit(' "-" "Mozilla/5.0"'),
    )
    parsed = parse_nginx_log(line)
    return df.select(
        "conv_id", "turn_idx",
        parsed.getField("client").alias("client"),
        parsed.getField("status").alias("status"),
        parsed.getField("size").alias("size"),
        parsed.getField("request").alias("request"),
    )


@register(
    "grok_apache_combined",
    parsed_cte(N_ORACLE)
    + """
SELECT conv_id, turn_idx, client_ip AS clientip,
       coalesce(username, '-') AS auth,
       log_time AS ts_str, http_method AS verb, http_url AS request,
       http_status::VARCHAR AS response, http_bytes::VARCHAR AS bytes,
       '"-"' AS referrer, '"Mozilla/5.0 (X11; Linux)"' AS agent
FROM parsed WHERE format = 'apache'""",
)
def q_grok_apache_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_grok with the logstash COMBINEDAPACHELOG composite
    pattern (the base-set breadth the reference resolves for real
    parse_grok configs): apache-format turns re-rendered as combined
    log lines, grok-parsed back; the oracle recovers the fields
    directly, so the recursive grok compiler is under the hash gate."""
    from vector_spark.functions.parse import parse_transcripts
    from vector_spark.functions.vrl import parse_grok

    df = parse_transcripts(load_transcripts(spark, sf_dir)).filter(
        F.col("format") == "apache"
    )
    line = F.concat(
        F.col("parsed.client_ip"), F.lit(" - "),
        F.coalesce(F.col("parsed.username"), F.lit("-")),
        F.lit(" ["), F.col("parsed.log_time"), F.lit('] "'),
        F.col("parsed.http_method"), F.lit(" "),
        F.col("parsed.http_url"), F.lit(' HTTP/1.1" '),
        F.col("parsed.http_status").cast("string"), F.lit(" "),
        F.col("parsed.http_bytes").cast("string"),
        F.lit(' "-" "Mozilla/5.0 (X11; Linux)"'),
    )
    g = parse_grok(line, "%{COMBINEDAPACHELOG}")
    return df.select(
        "conv_id", "turn_idx",
        g.getField("clientip").alias("clientip"),
        g.getField("auth").alias("auth"),
        g.getField("timestamp").alias("ts_str"),
        g.getField("verb").alias("verb"),
        g.getField("request").alias("request"),
        g.getField("response").alias("response"),
        g.getField("bytes").alias("bytes"),
        g.getField("referrer").alias("referrer"),
        g.getField("agent").alias("agent"),
    )


@register(
    "datadog_tags_facets",
    transcripts_cte(N_ORACLE)
    + """
SELECT
  CAST(sum(CASE WHEN role = 'assistant' AND tool = 'none' THEN 1 ELSE 0 END)
       AS BIGINT) AS n_tag_eq,
  CAST(sum(CASE WHEN role LIKE 'assist%' THEN 1 ELSE 0 END)
       AS BIGINT) AS n_tag_wild,
  CAST(sum(CASE WHEN role <> 'system' THEN 1 ELSE 0 END)
       AS BIGINT) AS n_not_missing,
  CAST(count(*) AS BIGINT) AS n_env
FROM transcripts""",
)
def q_datadog_tags_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datadog-search reserved tags-array matching
    (src/conditions/datadog_search.rs:102-160): turns carry a
    ddtags array (role:/tool:/env: elements); tag facets, wildcards,
    _missing_, and the literal tags: facet all compile to exists()
    over the array.  The oracle recovers the same counts from the flat
    columns the tags were built from."""
    from vector_spark.conditions_datadog import datadog_search

    df = load_transcripts(spark, sf_dir).withColumn(
        "ddtags",
        F.array(
            F.concat(F.lit("role:"), F.col("role")),
            F.concat(F.lit("tool:"), F.col("tool")),
            F.lit("env:prod"),
        ),
    )
    dd = lambda q: datadog_search(q, tags_cols=("ddtags",))  # noqa: E731
    flag = lambda c: F.sum(c.cast("long"))  # noqa: E731
    return df.agg(
        flag(dd('role:assistant AND tool:none AND tags:"env:prod"')).alias(
            "n_tag_eq"
        ),
        flag(dd("role:assist*")).alias("n_tag_wild"),
        flag(dd("NOT role:system AND _missing_:region")).alias(
            "n_not_missing"
        ),
        flag(dd("_exists_:env")).alias("n_env"),
    )


@register(
    "octet_framed_syslog",
    transcripts_cte(N_ORACLE)
    + """
SELECT conv_id,
       CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1
            AS INT) AS frame_idx,
       text AS message
FROM transcripts""",
)
def q_octet_framed_syslog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC6587 octet-counting framing round-trip
    (lib/codecs/src/decoding/framing/octet_counting.rs): every turn is
    octet-encoded, the per-conversation frames are concatenated into
    one payload (no separators — only the octet counts delimit), and
    the framer must recover every frame byte-exactly in order; the
    oracle reads the turns directly."""
    from vector_spark.sources.readers import octet_encode, octet_frames

    t = load_transcripts(spark, sf_dir)
    payloads = t.groupBy("conv_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("turn_idx"),
                            octet_encode(F.col("text")).alias("frame"),
                        )
                    )
                ),
                lambda x: x["frame"],
            ),
            "",
        ).alias("payload")
    )
    return payloads.select(
        "conv_id",
        F.posexplode(octet_frames(F.col("payload"))).alias(
            "frame_idx", "message"
        ),
    )


@register(
    "cri_roundtrip",
    transcripts_cte(N_ORACLE)
    + """
SELECT conv_id, turn_idx,
       CASE WHEN turn_idx % 2 = 0 THEN 'stdout' ELSE 'stderr' END AS stream,
       false AS partial, text AS message, ts AS line_ts
FROM transcripts""",
)
def q_cri_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """containerd/CRI codec round-trip: turns rendered as CRI log
    lines, decoded back; the oracle recovers the fields directly
    (sources/readers.py _decode_cri; reference
    lib/codecs cri format)."""
    from vector_spark.sources.readers import _decode_cri

    t = load_transcripts(spark, sf_dir)
    line = F.concat(
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
        F.lit(" "),
        F.when(F.col("turn_idx") % 2 == 0, "stdout").otherwise("stderr"),
        F.lit(" F "),
        F.col("text"),
    )
    d = _decode_cri(line, None)
    return t.select(
        "conv_id", "turn_idx",
        d.getField("stream").alias("stream"),
        d.getField("partial").alias("partial"),
        d.getField("message").alias("message"),
        d.getField("timestamp").alias("line_ts"),
    )


@register(
    "docker_json_roundtrip",
    transcripts_cte(N_ORACLE)
    + """
SELECT conv_id, turn_idx, text AS message,
       CASE WHEN role = 'assistant' THEN 'stdout' ELSE 'stderr' END AS stream,
       ts AS line_ts
FROM transcripts""",
)
def q_docker_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """docker json-file codec round-trip (trailing newline stripped
    from log, like the docker log driver writes it)."""
    from vector_spark.sources.readers import _decode_docker_json

    t = load_transcripts(spark, sf_dir)
    line = F.to_json(
        F.struct(
            F.concat(F.col("text"), F.lit("\n")).alias("log"),
            F.when(F.col("role") == "assistant", "stdout")
            .otherwise("stderr")
            .alias("stream"),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").alias(
                "time"
            ),
        )
    )
    d = _decode_docker_json(line, None)
    return t.select(
        "conv_id", "turn_idx",
        d.getField("message").alias("message"),
        d.getField("stream").alias("stream"),
        d.getField("timestamp").alias("line_ts"),
    )


@register(
    "gelf_roundtrip",
    transcripts_cte(N_ORACLE)
    + """
SELECT conv_id, turn_idx, role AS host, text AS short_message,
       CAST(turn_idx % 8 AS INT) AS level
FROM transcripts""",
)
def q_gelf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GELF codec round-trip (JSON with well-known fields)."""
    from vector_spark.sources.readers import _decode_gelf

    t = load_transcripts(spark, sf_dir)
    line = F.to_json(
        F.struct(
            F.lit("1.1").alias("version"),
            F.col("role").alias("host"),
            F.col("text").alias("short_message"),
            (F.col("turn_idx") % 8).cast("int").alias("level"),
        )
    )
    d = _decode_gelf(line, None)
    return t.select(
        "conv_id", "turn_idx",
        d.getField("host").alias("host"),
        d.getField("short_message").alias("short_message"),
        d.getField("level").alias("level"),
    )


@register(
    "trace_to_log_relabel",
    transcripts_cte(N_ORACLE)
    + """
SELECT 'log' AS kind, CAST(count(*) AS BIGINT) AS n
FROM transcripts WHERE role = 'tool'""",
)
def q_trace_to_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """trace_to_log (src/transforms/trace_to_log.rs): tool turns
    treated as trace events, re-tagged as logs; every output row must
    carry kind='log'."""
    from vector_spark.operators.metrics import trace_to_log

    traces = (
        load_transcripts(spark, sf_dir)
        .filter(F.col("role") == "tool")
        .withColumn("kind", F.lit("trace"))
    )
    logs = trace_to_log(traces)
    return logs.groupBy("kind").agg(F.count(F.lit(1)).alias("n"))


@register(
    "static_enrich_fields",
    transcripts_cte(N_ORACLE)
    + """
SELECT conv_id, turn_idx, 'i-0abc123' AS instance_id,
       'us-east-1' AS region, role
FROM transcripts WHERE turn_idx = 0""",
)
def q_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aws_ec2_metadata analogue (src/transforms/aws_ec2_metadata.rs):
    driver-resolved constant metadata columns stamped on every event."""
    from vector_spark.operators.metrics import static_enrich

    df = load_transcripts(spark, sf_dir).filter(F.col("turn_idx") == 0)
    out = static_enrich(
        df, {"instance_id": "i-0abc123", "region": "us-east-1"}
    )
    return out.select("conv_id", "turn_idx", "instance_id", "region", "role")


@register(
    "reduce_ends_when",
    transcripts_cte(N_ORACLE)
    + """,
m AS (
  SELECT conv_id, turn_idx, text,
         CASE WHEN lag(starts_with(text, '{"')) OVER w IS NULL
                OR lag(starts_with(text, '{"')) OVER w THEN 1 ELSE 0
         END AS is_start
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
seg AS (
  SELECT conv_id, turn_idx, text,
         CAST(sum(is_start) OVER (PARTITION BY conv_id ORDER BY turn_idx
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) - 1
           AS segment
  FROM m
)
SELECT conv_id, segment,
       CAST(count(*) AS BIGINT) AS n_turns,
       string_agg(text, chr(10) ORDER BY turn_idx) AS all_text
FROM seg GROUP BY conv_id, segment""",
)
def q_reduce_ends_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reduce with an ends_when flush condition
    (reduce/transform.rs: the matching event is INCLUDED in the group,
    then the group flushes): JSON lines close a segment; each segment
    reduces to its merged text."""
    from vector_spark.operators.reduce import reduce_segments

    df = reduce_segments(
        load_transcripts(spark, sf_dir),
        ["conv_id"],
        ord_col="turn_idx",
        ends_when=F.col("text").startswith('{"'),
        segment_col="segment",
    )
    return reduce_events(
        df,
        group_by=["conv_id", "segment"],
        strategies={
            "n_turns": ("count", "text"),
            "all_text": ("concat_newline", "text"),
        },
        ord_col="turn_idx",
        timestamps=False,
    )


@register(
    "cef_roundtrip",
    parsed_cte(N_ORACLE)
    + """
SELECT conv_id, turn_idx,
       'vector_spark' AS vendor,
       concat(http_url, '|p') AS name,
       5 AS severity_num,
       client_ip AS src,
       concat('status=', CAST(http_status AS VARCHAR)) AS cs1
FROM parsed WHERE format = 'apache'""",
)
def q_cef_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEF BOTH directions (encoding/format/cef.rs + VRL parse_cef):
    apache turns ENCODE via encode_cef — header pipe-escaping (the name
    carries a literal '|'), extension equals-escaping (cs1 carries a
    literal '='), sorted extensions, skip-empty — then parse back.
    The oracle recovers the fields directly, so the encoder's escaping
    and the parser's unescaping must cancel exactly for the hash to
    match."""
    from vector_spark.functions.parse import parse_transcripts
    from vector_spark.functions.vrl import encode_cef, parse_cef

    df = parse_transcripts(load_transcripts(spark, sf_dir)).filter(
        F.col("format") == "apache"
    )
    line = encode_cef(
        F.concat(F.col("parsed.http_url"), F.lit("|p")),
        F.lit(5),
        device_vendor="vector_spark",
        device_product="engine",
        device_version="1.0",
        extensions={
            "src": F.col("parsed.client_ip"),
            "act": F.lit("allow"),
            "cs1": F.concat(
                F.lit("status="), F.col("parsed.http_status").cast("string")
            ),
        },
    )
    c = parse_cef(line)
    return df.select(
        "conv_id", "turn_idx",
        c.getField("device_vendor").alias("vendor"),
        c.getField("name").alias("name"),
        c.getField("severity").cast("int").alias("severity_num"),
        F.element_at(c.getField("extensions"), "src").alias("src"),
        F.element_at(c.getField("extensions"), "cs1").alias("cs1"),
    )


@register(
    "vpc_flow_roundtrip",
    parsed_cte(N_ORACLE)
    + """
SELECT conv_id, turn_idx,
       client_ip AS srcaddr, http_status AS dstport,
       CAST(http_bytes AS BIGINT) AS bytes,
       CASE WHEN http_status >= 400 THEN 'REJECT' ELSE 'ACCEPT' END AS action
FROM parsed WHERE format = 'apache'""",
)
def q_vpc_flow_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_aws_vpc_flow_log: apache turns re-rendered as v2 flow-log
    lines, parsed back; oracle recovers fields directly."""
    from vector_spark.functions.parse import parse_transcripts
    from vector_spark.functions.vrl import parse_aws_vpc_flow_log

    df = parse_transcripts(load_transcripts(spark, sf_dir)).filter(
        F.col("format") == "apache"
    )
    line = F.concat_ws(
        " ",
        F.lit("2"), F.lit("123456789010"), F.lit("eni-1"),
        F.col("parsed.client_ip"), F.lit("172.31.0.2"),
        F.lit("443"), F.col("parsed.http_status").cast("string"),
        F.lit("6"), F.lit("10"),
        F.col("parsed.http_bytes").cast("string"),
        F.lit("1"), F.lit("2"),
        F.when(F.col("parsed.http_status") >= 400, "REJECT").otherwise(
            "ACCEPT"
        ),
        F.lit("OK"),
    )
    v = parse_aws_vpc_flow_log(line)
    return df.select(
        "conv_id", "turn_idx",
        v.getField("srcaddr").alias("srcaddr"),
        v.getField("dstport").alias("dstport"),
        v.getField("bytes").alias("bytes"),
        v.getField("action").alias("action"),
    )


@register(
    "syslog_encode_roundtrip",
    parsed_cte(N_ORACLE)
    + """
SELECT conv_id, turn_idx,
       CAST(19 AS INTEGER) AS fac,
       CAST(CASE level WHEN 'info' THEN 6 WHEN 'warn' THEN 4
                       WHEN 'error' THEN 3 ELSE 7 END AS INTEGER) AS sev,
       concat('h-', conv_id) AS hostname,
       service AS appname,
       turn_idx AS procid,
       'ID47' AS msgid,
       ts AS sts,
       concat('[lat@1 ms="', CAST(latency_ms AS VARCHAR), '"]') AS sd,
       msg AS message
FROM parsed WHERE format = 'json'""",
)
def q_syslog_encode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Syslog BOTH directions (encoding/format/syslog.rs +
    parse_syslog_5424): json turns ENCODE as RFC5424 lines — name
    facility/severity resolution ('local3'/level aliases incl. 'warn'),
    NIL handling, structured-data rendering — then parse back.  The
    oracle recovers every field directly, so PRI arithmetic, timestamp
    micros rendering, and SD quoting must cancel exactly."""
    from vector_spark.functions.parse import parse_transcripts
    from vector_spark.functions.vrl import encode_syslog, parse_syslog_5424

    df = parse_transcripts(load_transcripts(spark, sf_dir)).filter(
        F.col("format") == "json"
    )
    line = encode_syslog(
        F.col("parsed.msg"),
        facility=F.lit("local3"),
        severity=F.col("parsed.level"),
        app_name=F.col("parsed.service"),
        proc_id=F.col("turn_idx").cast("string"),
        msg_id=F.lit("ID47"),
        hostname=F.concat(F.lit("h-"), F.col("conv_id")),
        timestamp=F.col("ts"),
        structured_data=F.create_map(
            F.lit("lat@1"),
            F.create_map(F.lit("ms"), F.col("parsed.latency_ms").cast("string")),
        ),
    )
    p = parse_syslog_5424(line)
    return df.select(
        "conv_id", "turn_idx",
        p.getField("facility").alias("fac"),
        p.getField("severity").cast("int").alias("sev"),
        p.getField("hostname").alias("hostname"),
        p.getField("appname").alias("appname"),
        p.getField("procid").alias("procid"),
        p.getField("msgid").alias("msgid"),
        p.getField("timestamp").alias("sts"),
        p.getField("structured_data").alias("sd"),
        p.getField("message").alias("message"),
    )


@register(
    "gelf_encode_roundtrip",
    parsed_cte(N_ORACLE)
    + """
SELECT conv_id, turn_idx,
       '1.1' AS version,
       concat('h-', conv_id) AS host,
       msg AS short_message,
       CAST(epoch(ts) AS DOUBLE) AS ts_num,
       CAST(CASE level WHEN 'info' THEN 6 WHEN 'warn' THEN 4
                       WHEN 'error' THEN 3 ELSE 7 END AS INTEGER) AS lvl,
       service AS svc,
       latency_ms AS lat
FROM parsed WHERE format = 'json'""",
)
def q_gelf_encode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GELF encoder (encoding/format/gelf.rs) exercised end-to-end:
    json turns render as GELF 1.1 lines — required-field stamping,
    numeric-timestamp branch, underscore-prefixed additional fields,
    sorted keys — then from_json recovers the typed fields the oracle
    re-derives directly."""
    from vector_spark.functions.parse import parse_transcripts
    from vector_spark.functions.vrl import encode_gelf, to_syslog_severity

    df = parse_transcripts(load_transcripts(spark, sf_dir)).filter(
        F.col("format") == "json"
    )
    line = encode_gelf(
        F.concat(F.lit("h-"), F.col("conv_id")),
        F.col("parsed.msg"),
        timestamp=F.col("ts"),
        level=to_syslog_severity(F.col("parsed.level")),
        additional={
            "service": F.col("parsed.service"),
            "latency_ms": F.col("parsed.latency_ms"),
        },
    )
    g = F.from_json(
        line,
        "version string, host string, short_message string, "
        "timestamp double, level int, _service string, _latency_ms long",
    )
    return df.select(
        "conv_id", "turn_idx",
        g.getField("version").alias("version"),
        g.getField("host").alias("host"),
        g.getField("short_message").alias("short_message"),
        g.getField("timestamp").alias("ts_num"),
        g.getField("level").alias("lvl"),
        g.getField("_service").alias("svc"),
        g.getField("_latency_ms").alias("lat"),
    )


@register(
    "dnstap_roundtrip",
    transcripts_cte(N_ORACLE)
    + """
SELECT conv_id, turn_idx,
       CASE WHEN turn_idx % 2 = 0 THEN 'ClientQuery'
            ELSE 'ClientResponse' END AS msg_type,
       'INET' AS family, 'UDP' AS protocol,
       concat('10.', CAST(turn_idx % 200 AS VARCHAR), '.0.7') AS src_addr,
       CAST(1024 + turn_idx % 60000 AS INTEGER) AS src_port,
       CAST(floor(epoch(ts)) AS BIGINT) * 1000000000 AS time_ns,
       CAST(turn_idx % 65536 AS INTEGER) AS qid,
       concat(tool, '.', conv_id, '.example.com.') AS qname,
       CASE role WHEN 'user' THEN 'A' WHEN 'assistant' THEN 'AAAA'
                 WHEN 'tool' THEN 'TXT' ELSE 'MX' END AS qtype
FROM transcripts""",
)
def q_dnstap_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_dnstap under the full value-hash gate
    (lib/vector-vrl/dnstap-parser/src/parser.rs + lib/dnsmsg-parser):
    every turn becomes a dnstap protobuf frame carrying a DNS query
    wire message (this repo's own protobuf encoder builds the
    envelope), alternating ClientQuery / ClientResponse so BOTH the
    requestData and responseData paths — and the reference's
    absent-message time placement — are exercised.  The oracle
    re-derives every field directly."""
    from vector_spark.functions.dnstap import encode_dnstap, parse_dnstap

    t = load_transcripts(spark, sf_dir)
    frame = encode_dnstap(
        F.pmod(F.col("turn_idx"), F.lit(65536)),
        F.concat_ws(".", "tool", "conv_id", F.lit("example.com")),
        F.when(F.col("role") == "user", 1)
        .when(F.col("role") == "assistant", 28)
        .when(F.col("role") == "tool", 16).otherwise(15),
        F.concat(F.lit("10."),
                 F.pmod(F.col("turn_idx"), F.lit(200)).cast("string"),
                 F.lit(".0.7")),
        F.lit(1024) + F.pmod(F.col("turn_idx"), F.lit(60000)),
        F.unix_timestamp("ts"),
        F.when(F.pmod(F.col("turn_idx"), F.lit(2)) == 0, 5).otherwise(6),
    )
    ev = F.from_json(
        parse_dnstap(frame),
        "messageType string, socketFamily string, socketProtocol string, "
        "sourceAddress string, sourcePort int, time long, "
        "requestData struct<time: long, header: struct<id: int>, "
        "question: array<struct<domainName: string, questionType: string>>>, "
        "responseData struct<header: struct<id: int>, "
        "question: array<struct<domainName: string, questionType: string>>>",
    )
    q = F.coalesce(
        ev.getField("requestData").getField("question"),
        ev.getField("responseData").getField("question"),
    ).getItem(0)
    return t.select(
        "conv_id", "turn_idx",
        ev.getField("messageType").alias("msg_type"),
        ev.getField("socketFamily").alias("family"),
        ev.getField("socketProtocol").alias("protocol"),
        ev.getField("sourceAddress").alias("src_addr"),
        ev.getField("sourcePort").alias("src_port"),
        # ClientQuery: top-level time; ClientResponse with only a query
        # time: the reference parks it under the absent requestData
        F.coalesce(
            ev.getField("time"),
            ev.getField("requestData").getField("time"),
        ).alias("time_ns"),
        F.coalesce(
            ev.getField("requestData").getField("header").getField("id"),
            ev.getField("responseData").getField("header").getField("id"),
        ).alias("qid"),
        q.getField("domainName").alias("qname"),
        q.getField("questionType").alias("qtype"),
    )


@register(
    "scale_chain_rows",
    f"""
WITH seq AS (SELECT range AS id FROM range({N_ORACLE})),
r AS (
  SELECT id,
         (id * 2654435761) % 2147483647 AS r1,
         (id * 1103515245 + 12345) % 2147483647 AS r2
  FROM seq
),
b AS (
  SELECT id AS event_id,
         (['api-service', 'auth-service', 'internal-metrics-agent',
           'billing-service'])[(r1 % 4) + 1] AS service,
         CAST(CASE WHEN r2 % 10 < 9 THEN 200 ELSE 500 END AS INT) AS status,
         CAST(r1 % 100000 AS BIGINT) AS bytes,
         concat('host-', CAST(r2 % 50 AS VARCHAR)) AS src_host
  FROM r
),
keep AS (
  SELECT * FROM b
  WHERE {_H60_SQL.format(
      e="concat_ws('|', service, CAST(event_id AS VARCHAR))")} % 2 = 0
)
SELECT event_id, service, status, bytes, src_host,
       2 AS n_tags, 'info' AS severity_class
FROM keep""",
)
def q_scale_chain_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 12-step scaling chain (plans/scale_chain.py,
    regression/cases/scale_sync_only_8_cpu) under the hash gate: the
    oracle recomputes the expected survivors and their fields straight
    from the deterministic generator, so a break in ANY chain step —
    grok parse (status/bytes), renames (src_host), ddtags filter
    (n_tags), service filter, per-service sampling, severity
    classification — shows up as a row or hash mismatch."""
    from vector_spark.data.transcripts import n_turns_for_sf_dir
    from vector_spark.plans.scale_chain import scale_chain, synth_scale_events

    n = n_turns_for_sf_dir(sf_dir)
    out = scale_chain(synth_scale_events(spark, n), portable_sample=True)
    return out.select(
        "event_id",
        "service",
        F.col("http.status").alias("status"),
        F.col("http.bytes").alias("bytes"),
        "src_host",
        F.size("ddtags").alias("n_tags"),
        "severity_class",
    )


@register(
    "multiline_records",
    transcripts_cte(N_ORACLE)
    + """,
marks AS (
  SELECT conv_id, turn_idx, text,
         CASE WHEN lag(text) OVER w IS NULL
                OR regexp_matches(text, '^\\{"') THEN 1 ELSE 0 END AS is_start
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
recs AS (
  SELECT conv_id, turn_idx, text,
         sum(is_start) OVER (PARTITION BY conv_id ORDER BY turn_idx
                             ROWS UNBOUNDED PRECEDING) AS rec
  FROM marks
)
SELECT conv_id,
       string_agg(text, chr(10) ORDER BY turn_idx) AS message,
       min(turn_idx) AS turn_idx
FROM recs GROUP BY conv_id, rec""",
)
def q_multiline_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """line_agg halt_before (the legacy file-source multiline default,
    /root/reference/src/line_agg.rs:39-42, for_legacy at :73-78): a
    JSON line starts a new record; following non-JSON lines fold in.
    Per-conversation streams stand in for per-file line streams."""
    from vector_spark.sources.readers import line_agg

    return line_agg(
        load_transcripts(spark, sf_dir),
        start_pattern=r'^\{"',
        group_by=["conv_id"],
        order_by="turn_idx",
        line_col="text",
        mode="halt_before",
    )


# ---------------------------------------------------------------------------
# dedupe


@register(
    "dedupe_first_wins",
    transcripts_cte(N_ORACLE)
    + """,
dup AS (
  SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts
  UNION ALL
  SELECT conv_id, turn_idx, concat(role, '_dup') AS role, text, tool, ts
  FROM transcripts WHERE turn_idx % 50 = 0
),
rn AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY ts, role) AS _rn
  FROM dup
)
SELECT conv_id, turn_idx, role FROM rn WHERE _rn = 1""",
)
def q_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load_transcripts(spark, sf_dir)
    dup = base.unionByName(
        base.filter(F.col("turn_idx") % 50 == 0).withColumn(
            "role", F.concat(F.col("role"), F.lit("_dup"))
        )
    )
    return dedupe(
        dup, match=["conv_id", "turn_idx"], order_by=["ts", "role"]
    ).select("conv_id", "turn_idx", "role")


@register(
    "dedupe_ignore_mode",
    transcripts_cte(N_ORACLE)
    + """,
rn AS (
  SELECT conv_id, turn_idx, role, text, tool, ts,
         row_number() OVER (
           PARTITION BY conv_id, turn_idx, role, text, tool
           ORDER BY ts, conv_id, turn_idx) AS _rn
  FROM transcripts
)
SELECT conv_id, turn_idx, role FROM rn WHERE _rn = 1""",
)
def q_dedupe_ignore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedupe ignore-fields mode: fingerprint = all columns except ts."""
    df = load_transcripts(spark, sf_dir)
    return dedupe(df, ignore=["ts"]).select("conv_id", "turn_idx", "role")


@register(
    "latest_status_by_service",
    _ENRICH_CTE
    + """,
rn AS (
  SELECT service, http_status, latency_ms,
         row_number() OVER (PARTITION BY service
                            ORDER BY ts DESC, conv_id DESC, turn_idx DESC) AS _last,
         row_number() OVER (PARTITION BY service
                            ORDER BY ts ASC, conv_id ASC, turn_idx ASC) AS _first
  FROM enriched
),
agg AS (SELECT service, count(*) AS n FROM enriched GROUP BY service)
SELECT a.service,
       mx.http_status AS last_status,
       mn.latency_ms AS first_latency,
       a.n
FROM agg a
LEFT JOIN (SELECT service, http_status FROM rn WHERE _last = 1) mx USING (service)
LEFT JOIN (SELECT service, latency_ms FROM rn WHERE _first = 1) mn USING (service)""",
)
def q_latest_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aggregate modes Latest/Earliest, deterministic under ts ties via
    a UNIQUE ordering key (ts, conv_id, turn_idx).

    ONE max_by/min_by aggregation (map-side partial combine) — NOT a
    partitionBy(service) window: service is low-cardinality, and a
    window would funnel every row of a hot service into one task.
    Spark's max_by keeps a null value at the winning ordering key
    (matching the oracle's row_number semantics); DuckDB's arg_max
    would skip nulls, which is why the ORACLE stays row_number SQL."""
    df = _enriched(spark, sf_dir)
    ord_c = F.struct(F.col("ts"), F.col("conv_id"), F.col("turn_idx"))
    return df.groupBy("service").agg(
        F.max_by(F.col("http_status"), ord_c).alias("last_status"),
        F.min_by(F.col("latency_ms"), ord_c).alias("first_latency"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# sample / throttle / context window


@register(
    "sample_mod_1in7",
    transcripts_cte(N_ORACLE)
    + """
SELECT conv_id, turn_idx, 7 AS sample_rate FROM transcripts
WHERE (turn_idx * 2654435761 + length(text)) % 7 = 0""",
)
def q_sample_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_transcripts(spark, sf_dir)
    key = F.col("turn_idx").cast("long") * 2654435761 + F.length("text")
    return sample_mod(df, 7, key).select("conv_id", "turn_idx", "sample_rate")


@register(
    "sample_ratio_0p2",
    transcripts_cte(N_ORACLE)
    + f"""
SELECT conv_id, turn_idx, 5.0 AS sample_rate FROM transcripts
WHERE {_H60_SQL.format(e="concat(conv_id, '#', turn_idx)")} % 1000000
      < 200000""",
)
def q_sample_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ratio sampling (the reference's `ratio` mode made
    reproducible): hash slice of [0, 1e6)."""
    from vector_spark.operators.sample import sample_ratio_hash

    df = load_transcripts(spark, sf_dir)
    key = F.concat(F.col("conv_id"), F.lit("#"), F.col("turn_idx").cast("string"))
    return sample_ratio_hash(df, 0.2, key).select(
        "conv_id", "turn_idx", "sample_rate"
    )


@register(
    "sample_group_consistent",
    transcripts_cte(N_ORACLE)
    + f"""
SELECT conv_id, turn_idx, role, 4 AS sample_rate FROM transcripts
WHERE {_H60_SQL.format(e="concat_ws('|', role, conv_id)")} % 4 = 0""",
)
def q_sample_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_by + key_field consistent sampling
    (sample/transform.rs:62-93): each (role, conv) pair samples
    independently, same key always same decision."""
    from vector_spark.operators.sample import sample

    df = load_transcripts(spark, sf_dir)
    return sample(
        df, rate=4, key_field="conv_id", group_by=["role"], portable=True
    ).select("conv_id", "turn_idx", "role", "sample_rate")


@register(
    "throttle_5_per_10m",
    transcripts_cte(N_ORACLE)
    + """,
rn AS (
  SELECT conv_id, turn_idx, role,
         row_number() OVER (
           PARTITION BY role, floor(epoch(ts))::BIGINT // 600
           ORDER BY ts, conv_id, turn_idx) AS _rn
  FROM transcripts
)
SELECT conv_id, turn_idx, role FROM rn WHERE _rn <= 5""",
)
def q_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = throttle(
        load_transcripts(spark, sf_dir),
        threshold=5,
        window_sec=600,
        key_fields=["role"],
    )
    return df.select("conv_id", "turn_idx", "role")


@register(
    "throttle_exclude_bypass",
    parsed_cte(N_ORACLE)
    + """,
ranked AS (
  SELECT conv_id, turn_idx, role, level,
         sum(CASE WHEN level = 'error' THEN 0 ELSE 1 END) OVER (
           PARTITION BY role,
                        CAST(floor(epoch(ts)) AS BIGINT) // 600
           ORDER BY ts, conv_id, turn_idx
           ROWS UNBOUNDED PRECEDING) AS admitted
  FROM parsed
)
SELECT conv_id, turn_idx, role
FROM ranked WHERE level = 'error' OR admitted <= 5""",
)
def q_throttle_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    """throttle with exclude bypass (transform.rs:103-110): error-level
    events pass without consuming capacity — the round-1 ADVICE fix,
    now under the hash gate."""
    from vector_spark.functions.parse import parse_transcripts

    df = parse_transcripts(load_transcripts(spark, sf_dir)).select(
        "conv_id", "turn_idx", "role", "ts",
        F.col("parsed.level").alias("level"),
    )
    out = throttle(
        df, threshold=5, window_sec=600, key_fields=["role"],
        order_by=["ts", "conv_id", "turn_idx"],
        exclude=F.col("level") == "error",
    )
    return out.select("conv_id", "turn_idx", "role")


@register(
    "reduce_max_events",
    transcripts_cte(N_ORACLE)
    + """,
seg AS (
  SELECT conv_id, turn_idx, text,
         (row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1)
           // 4 AS segment
  FROM transcripts
)
SELECT conv_id, CAST(segment AS BIGINT) AS segment,
       CAST(count(*) AS BIGINT) AS n_turns,
       string_agg(text, chr(10) ORDER BY turn_idx) AS all_text
FROM seg GROUP BY conv_id, segment""",
)
def q_reduce_max_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reduce max_events flush (reduce/transform.rs:195): groups cap at
    4 events, then flush."""
    from vector_spark.operators.reduce import reduce_segments

    df = reduce_segments(
        load_transcripts(spark, sf_dir),
        ["conv_id"], ord_col="turn_idx", max_events=4,
        segment_col="segment",
    )
    return reduce_events(
        df,
        group_by=["conv_id", "segment"],
        strategies={"n_turns": ("count", "text"),
                    "all_text": ("concat_newline", "text")},
        ord_col="turn_idx",
        timestamps=False,
    )


@register(
    "context_window_errors",
    _ENRICH_CTE
    + """,
f AS (
  SELECT conv_id, turn_idx,
         CASE WHEN coalesce(level, '') = 'error' THEN 1 ELSE 0 END AS flag
  FROM enriched
),
k AS (
  SELECT conv_id, turn_idx,
         max(flag) OVER (PARTITION BY conv_id ORDER BY turn_idx
                         ROWS BETWEEN 1 PRECEDING AND 2 FOLLOWING) AS near
  FROM f
)
SELECT conv_id, turn_idx FROM k WHERE near = 1""",
)
def q_context_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = context_window(
        _enriched(spark, sf_dir),
        flush_when="coalesce(level, '') = 'error'",
        group_by=["conv_id"],
        order_by=["turn_idx"],
        before=2,
        after=1,
    )
    return df.select("conv_id", "turn_idx")


# ---------------------------------------------------------------------------
# metric family


_METRIC_CTE = (
    _ENRICH_CTE
    + """,
metrics AS (
  SELECT 'svc_requests' AS name, 'pipeline' AS namespace,
         concat('{"service":"', service, '"}') AS tags_json,
         'incremental' AS kind, 1.0 AS value, ts
  FROM enriched WHERE service IS NOT NULL
)"""
)


@register(
    "log_to_metric_agg",
    _METRIC_CTE
    + """
SELECT name, namespace, tags_json,
       make_timestamp(((floor(epoch(ts))::BIGINT // 3600) * 3600) * 1000000) AS window_start,
       count(*) AS n, sum(value) AS total
FROM metrics GROUP BY 1, 2, 3, 4""",
)
def q_log_to_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _enriched(spark, sf_dir).select("ts", "service")
    metrics = log_to_metric(
        df.filter(F.col("service").isNotNull()),
        [{"type": "counter", "name": "svc_requests", "namespace": "pipeline",
          "tags": {"service": "service"}}],
    ).withColumn("tags_json", F.to_json("tags"))
    return aggregate(
        metrics,
        keys=["name", "namespace", "tags_json"],
        specs={"n": ("count", "*"), "total": ("sum", "value")},
        ts_col="ts",
        interval_sec=3600,
    )


@register(
    "metric_to_log_roundtrip",
    _ENRICH_CTE
    + """,
m AS (
  SELECT 'svc_requests' AS name, 'incremental' AS kind, 1.0 AS value,
         service
  FROM enriched WHERE service IS NOT NULL
  UNION ALL
  SELECT 'latency_gauge' AS name, 'absolute' AS kind,
         CAST(latency_ms AS DOUBLE) AS value, service
  FROM enriched WHERE service IS NOT NULL AND latency_ms IS NOT NULL
)
SELECT name, kind, round(sum(value), 6) AS sum_value,
       CAST(count(*) AS BIGINT) AS n
FROM m GROUP BY 1, 2""",
)
def q_metric_to_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """metric_to_log (metric_to_log.rs:33-90): metric rows serialized
    into a JSON log message; the query extracts the fields BACK from
    the message, so the oracle gates that serialization round-trips
    every value (name, kind, numeric value)."""
    from vector_spark.operators import metric_to_log

    df = _enriched(spark, sf_dir).filter(F.col("service").isNotNull())
    metrics = log_to_metric(
        df,
        [
            {"type": "counter", "name": "svc_requests",
             "namespace": "pipeline", "tags": {"service": "service"}},
            {"type": "gauge", "name": "latency_gauge",
             "namespace": "pipeline", "field": "latency_ms",
             "tags": {"service": "service"}},
        ],
    )
    logs = metric_to_log(metrics)
    return (
        logs.select(
            F.get_json_object("message", "$.name").alias("name"),
            F.get_json_object("message", "$.kind").alias("kind"),
            F.get_json_object("message", "$.value").cast("double").alias("v"),
        )
        .groupBy("name", "kind")
        .agg(
            F.round(F.sum("v"), 6).alias("sum_value"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "incremental_to_absolute",
    _METRIC_CTE
    + """
SELECT name, namespace, tags_json, ts,
       sum(value) OVER (PARTITION BY name, namespace, tags_json ORDER BY ts) AS value
FROM metrics""",
)
def q_incr_to_abs(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _enriched(spark, sf_dir).select("ts", "service")
    metrics = log_to_metric(
        df.filter(F.col("service").isNotNull()),
        [{"type": "counter", "name": "svc_requests", "namespace": "pipeline",
          "tags": {"service": "service"}}],
    ).withColumn("tags_json", F.to_json("tags"))
    out = incremental_to_absolute(
        metrics, series_keys=["name", "namespace", "tags_json"]
    )
    return out.select("name", "namespace", "tags_json", "ts", "value")


@register(
    "tag_cardinality_limit_3",
    _ENRICH_CTE
    + """,
vals AS (
  SELECT service, min(ts) AS first_ts FROM enriched
  WHERE service IS NOT NULL GROUP BY service
),
ok AS (
  SELECT service FROM (
    SELECT service, row_number() OVER (ORDER BY first_ts, service) AS r FROM vals
  ) WHERE r <= 3
)
SELECT CASE WHEN e.service IN (SELECT service FROM ok) THEN e.service END AS service,
       count(*) AS n
FROM enriched e
GROUP BY 1""",
)
def q_tag_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _enriched(spark, sf_dir).select("conv_id", "turn_idx", "ts", "service")
    limited = tag_cardinality_limit(df, ["service"], value_limit=3)
    return limited.groupBy("service").agg(F.count(F.lit(1)).alias("n"))


@register(
    "latency_quantiles",
    _ENRICH_CTE
    + """
SELECT role,
       quantile_cont(latency_ms, 0.5) AS p50,
       quantile_cont(latency_ms, 0.95) AS p95,
       quantile_cont(latency_ms, 0.99) AS p99,
       count(latency_ms) AS n
FROM enriched GROUP BY role""",
)
def q_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AggregatedSummary quantiles (exact percentile == quantile_cont)."""
    df = _enriched(spark, sf_dir)
    return df.groupBy("role").agg(
        F.percentile("latency_ms", F.lit(0.5)).alias("p50"),
        F.percentile("latency_ms", F.lit(0.95)).alias("p95"),
        F.percentile("latency_ms", F.lit(0.99)).alias("p99"),
        F.count("latency_ms").alias("n"),
    )


_DD_GAMMA = 1.01 / 0.99  # alpha = 0.01


def _dd_quantile_sql(q: float) -> str:
    g = repr(_DD_GAMMA)
    return (
        f"CASE WHEN ceil({q} * total) <= nz THEN 0.0 "
        f"ELSE round(2 * pow({g}, b{int(q * 100)}) / ({g} + 1), 6) END"
    )


@register(
    "ddsketch_quantiles",
    _ENRICH_CTE
    + f""",
lat AS (
  SELECT service, CAST(latency_ms AS DOUBLE) AS v
  FROM enriched WHERE format = 'json' AND latency_ms IS NOT NULL
),
bk AS (
  SELECT service,
         CASE WHEN v > 0
              THEN CAST(ceil(ln(v) / ln({repr(_DD_GAMMA)})) AS INT) END AS b,
         count(*) AS c
  FROM lat GROUP BY 1, 2
),
tot AS (
  SELECT service, CAST(sum(c) AS BIGINT) AS total,
         CAST(sum(CASE WHEN b IS NULL THEN c ELSE 0 END) AS BIGINT) AS nz
  FROM bk GROUP BY 1
),
cum AS (
  SELECT service, b, CAST(sum(c) OVER (
    PARTITION BY service ORDER BY b
    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM bk WHERE b IS NOT NULL
),
qx AS (
  SELECT c.service,
         min(CASE WHEN t.nz + c.cum >= ceil(0.5 * t.total) THEN c.b END) AS b50,
         min(CASE WHEN t.nz + c.cum >= ceil(0.95 * t.total) THEN c.b END) AS b95,
         min(CASE WHEN t.nz + c.cum >= ceil(0.99 * t.total) THEN c.b END) AS b99,
         any_value(t.total) AS total, any_value(t.nz) AS nz
  FROM cum c JOIN tot t USING (service) GROUP BY c.service
)
SELECT service,
       {_dd_quantile_sql(0.5)} AS p50,
       {_dd_quantile_sql(0.95)} AS p95,
       {_dd_quantile_sql(0.99)} AS p99,
       total
FROM qx""",
)
def q_ddsketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSketch metric value type (vector-core metric/value.rs:83):
    per-(service, minute) sketches MERGED up to service level, then
    quantiles extracted from the merged sketch — the cross-window
    re-aggregation plain percentiles can't do.  The oracle recomputes
    the same log-bucket math in SQL, covering bucketing, merge
    associativity, and quantile extraction."""
    from vector_spark.operators.aggregate import window_start
    from vector_spark.operators.sketch import (
        ddsketch,
        ddsketch_merge,
        ddsketch_quantile,
    )

    df = (
        _enriched(spark, sf_dir)
        .filter((F.col("format") == "json") & F.col("latency_ms").isNotNull())
        .select(
            "service",
            window_start(F.col("ts"), 60).alias("win"),
            F.col("latency_ms").cast("double").alias("v"),
        )
    )
    per_window = ddsketch(df, ["service", "win"], "v")
    merged = ddsketch_merge(per_window, ["service"])
    return merged.select(
        "service",
        *[
            ddsketch_quantile(
                F.col("sketch"), F.col("n_zero"), F.col("total"), q
            ).alias(f"p{int(q * 100)}")
            for q in (0.5, 0.95, 0.99)
        ],
        "total",
    )


@register(
    "latency_histogram",
    _ENRICH_CTE
    + """
SELECT CAST(floor(latency_ms / 250.0) * 250.0 AS DOUBLE) AS bucket_lo,
       count(*) AS n
FROM enriched WHERE latency_ms IS NOT NULL
GROUP BY 1""",
)
def q_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AggregatedHistogram with explicit fixed-width buckets."""
    from vector_spark.operators import histogram

    return histogram(_enriched(spark, sf_dir), "latency_ms", 250.0)


@register(
    "remap_program",
    transcripts_cte(N_ORACLE)
    + """
SELECT conv_id, turn_idx,
       upper(role) AS role_uc,
       length(text) AS text_len,
       CAST(turn_idx * 7 AS BIGINT) AS offset_s
FROM transcripts
WHERE NOT (length(text) < 20 AND turn_idx = 0)""",
)
def q_remap_program(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic expression-program remap with an error channel."""
    from vector_spark.operators import remap

    res = remap(
        load_transcripts(spark, sf_dir),
        {
            "role_uc": "upper(role)",
            "text_len": "length(text)",
            "offset_s": "CAST(turn_idx * 7 AS BIGINT)",
        },
        error_when="text_len < 20 AND turn_idx = 0",
        deletions=["text", "role", "tool", "ts"],
    )
    return res.main


# ---------------------------------------------------------------------------
# generic engine coverage over driver-provided tables


@register(
    "tpch_q1",
    """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       sum(l_extendedprice) AS sum_base_price,
       sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus""",
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "events_window_agg",
    """
SELECT event_type,
       make_timestamp(((floor(epoch(ts))::BIGINT // 3600) * 3600) * 1000000) AS window_start,
       count(*) AS n, sum(value) AS sum_value
FROM events GROUP BY 1, 2""",
)
def q_events_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return aggregate(
        ev,
        keys=["event_type"],
        specs={"n": ("count", "*"), "sum_value": ("sum", "value")},
        ts_col="ts",
        interval_sec=3600,
    )


@register(
    "broadcast_join_nation",
    """
SELECT n.n_name AS nation, count(*) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1""",
)
def q_join_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "avro_roundtrip",
    transcripts_cte(N_ORACLE)
    + """
SELECT conv_id, turn_idx, role, tool
FROM transcripts""",
)
def q_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro codec under the full value-hash gate: every turn's key
    fields are encoded to an Avro binary datum and decoded back with
    the pure-Python codec (sources/avro.py; reference:
    lib/codecs/src/decoding/format/avro.rs + encoding/format/avro.rs).
    The oracle selects the same fields directly, so any wire-format
    asymmetry (zigzag, unions, field order) breaks the hash."""
    import json as _json

    from vector_spark.sources.avro import encode_avro_py, from_avro_py

    sch = _json.dumps({
        "type": "record", "name": "Turn",
        "fields": [
            {"name": "conv_id", "type": "string"},
            {"name": "turn_idx", "type": "int"},
            {"name": "role", "type": ["null", "string"]},
            {"name": "tool", "type": ["null", "string"]},
        ],
    })
    t = load_transcripts(spark, sf_dir)
    enc = t.select(
        encode_avro_py(
            sch, F.col("conv_id"), F.col("turn_idx"),
            F.col("role"), F.col("tool"),
        ).alias("avro")
    )
    r = enc.select(from_avro_py(F.col("avro"), sch).alias("r"))
    return r.select(
        F.col("r.conv_id").alias("conv_id"),
        F.col("r.turn_idx").alias("turn_idx"),
        F.col("r.role").alias("role"),
        F.col("r.tool").alias("tool"),
    )


@register(
    "protobuf_roundtrip",
    transcripts_cte(N_ORACLE)
    + """
SELECT conv_id, turn_idx, role,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts_unix
FROM transcripts""",
)
def q_protobuf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Protobuf codec under the full value-hash gate: key fields encode
    to a binary message and decode back through the descriptor-driven
    pure-Python codec (sources/protobuf.py; reference:
    lib/codecs/src/decoding/format/protobuf.rs desc_file/message_type).
    The descriptor comes from .proto source text; the same registry
    round-trips through a binary FileDescriptorSet in
    tests/test_protobuf.py."""
    from vector_spark.sources.protobuf import (
        encode_protobuf_py, from_protobuf_py, parse_proto_text,
    )

    reg = parse_proto_text("""
        syntax = "proto3";
        package pipeline;
        message Turn {
          string conv_id = 1;
          int32 turn_idx = 2;
          string role = 3;
          sint64 ts_unix = 4;
        }
    """)
    t = load_transcripts(spark, sf_dir)
    enc = t.select(
        encode_protobuf_py(
            reg, "pipeline.Turn",
            F.col("conv_id"), F.col("turn_idx"), F.col("role"),
            F.unix_timestamp("ts"),
        ).alias("pb")
    )
    r = enc.select(
        from_protobuf_py(F.col("pb"), reg, "pipeline.Turn").alias("r")
    )
    return r.select(
        F.col("r.conv_id").alias("conv_id"),
        F.col("r.turn_idx").alias("turn_idx"),
        F.col("r.role").alias("role"),
        F.col("r.ts_unix").alias("ts_unix"),
    )


@register(
    "otlp_roundtrip",
    transcripts_cte(N_ORACLE)
    + """
SELECT conv_id, turn_idx, role AS severity_text, text AS body,
       CAST(floor(epoch(ts)) AS BIGINT) * 1000000000 AS time_unix_nano
FROM transcripts""",
)
def q_otlp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OTLP codec under the full value-hash gate: every turn becomes a
    one-LogRecord ExportLogsServiceRequest (engine encoder,
    sources/otlp.py:encode_logs_request), decodes back through the
    typed `otlp_log_records` flatten, and the original fields are
    recovered from body/severity/attributes — any wire asymmetry in
    the protobuf encoding (varints, AnyValue oneof, nesting) breaks
    the hash.  Reference: decoding/format/otlp.rs +
    encoding/format/otlp.rs."""
    from vector_spark.sources.otlp import encode_logs_request, otlp_log_records

    t = load_transcripts(spark, sf_dir)

    @F.pandas_udf("binary")
    def _enc(pdf):
        def run(row):
            return encode_logs_request({
                "resourceLogs": [{
                    "scopeLogs": [{
                        "logRecords": [{
                            "timeUnixNano": int(row["ts_ns"]),
                            "severityText": row["role"],
                            "body": {"stringValue": row["text"]},
                            "attributes": [
                                {"key": "conv_id", "value": {
                                    "stringValue": row["conv_id"]}},
                                {"key": "turn_idx", "value": {
                                    "intValue": int(row["turn_idx"])}},
                            ],
                        }],
                    }],
                }],
            })

        return pdf.apply(run, axis=1)

    enc = t.select(
        _enc(F.struct(
            F.col("conv_id"), F.col("turn_idx"), F.col("role"),
            F.col("text"),
            (F.unix_timestamp("ts") * F.lit(1_000_000_000))
            .alias("ts_ns"),
        )).alias("content")
    )
    recs = otlp_log_records(enc)
    return recs.select(
        F.col("attributes")["conv_id"].alias("conv_id"),
        F.col("attributes")["turn_idx"].cast("int").alias("turn_idx"),
        F.col("severity_text").alias("severity_text"),
        F.col("body").alias("body"),
        F.col("time_unix_nano").alias("time_unix_nano"),
    )


@register(
    "events_sliding_agg",
    """
WITH e AS (
  SELECT event_type, value, CAST(floor(epoch(ts)) AS BIGINT) AS t
  FROM events
),
x AS (
  -- floor-mod alignment (matches Spark pmod for negative epochs);
  -- no clamp: every event lands in exactly interval/slide windows
  SELECT event_type, value,
         unnest(generate_series(
           (t - ((t % 1800) + 1800) % 1800) - 1800,
           t - ((t % 1800) + 1800) % 1800, 1800
         )) AS ws
  FROM e
)
SELECT event_type, make_timestamp(ws * 1000000) AS window_start,
       count(*) AS n, sum(value) AS sum_value
FROM x GROUP BY 1, 2""",
)
def q_events_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window aggregate (operators/aggregate.py:
    sliding_aggregate): 1-hour windows sliding every 30 minutes — each
    event lands in interval/slide = 2 windows.  The oracle re-derives
    the slide-aligned window-start sequence per event, so boundary
    drift (off-by-one slide, wrong first window) breaks the hash."""
    from vector_spark.operators.aggregate import sliding_aggregate

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sliding_aggregate(
        ev,
        keys=["event_type"],
        specs={"n": ("count", "*"), "sum_value": ("sum", "value")},
        ts_col="ts",
        interval_sec=3600,
        slide_sec=1800,
    )


# ---------------------------------------------------------------------------
# Probabilistic membership (round 5): bloom + cuckoo enrichment tables
# and the probabilistic tag_cardinality_limit mode — portable md5-bit
# constructions, so the oracle replays every bit position, fingerprint,
# and false positive.

_B60 = "try_cast(concat('0x', substr(md5({e}), 1, 15)) AS BIGINT)"


def _bloom_pos_sql(i: int, key: str, m_bits: int) -> str:
    return (
        _B60.format(
            e=f"concat_ws(':', 'bloom{i}', CAST({key} AS VARCHAR))"
        )
        + f" % {m_bits}"
    )


@register(
    "bloom_table_membership",
    f"""
WITH k AS (
  SELECT user_id FROM events WHERE event_type = 'error'
  GROUP BY user_id HAVING count(*) >= 10
),
bits AS (
  SELECT DISTINCT pos FROM (
    SELECT {_bloom_pos_sql(0, 'user_id', 256)} AS pos FROM k
    UNION ALL
    SELECT {_bloom_pos_sql(1, 'user_id', 256)} AS pos FROM k
  )
),
dv AS (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
probe AS (
  SELECT user_id, unnest([{_bloom_pos_sql(0, 'user_id', 256)},
                          {_bloom_pos_sql(1, 'user_id', 256)}]) AS pos
  FROM dv
),
hits AS (
  SELECT user_id FROM probe JOIN bits USING (pos)
  GROUP BY user_id HAVING count(*) = 2
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (WHERE h.user_id IS NOT NULL) AS BIGINT)
         AS n_bloom_hits,
       CAST(count(*) FILTER (WHERE h.user_id IS NOT NULL
                               AND k2.user_id IS NULL) AS BIGINT)
         AS n_false_positives
FROM events e
LEFT JOIN hits h ON e.user_id = h.user_id
LEFT JOIN k k2 ON e.user_id = k2.user_id
GROUP BY e.event_type""",
)
def q_bloom_table_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom enrichment table (operators/probabilistic.py — the
    bloom_table.rs re-spec): heavy-error users (>= 10 error events)
    populate a 256-bit / 2-hash filter; every event probes its
    user_id.  Per event_type: events, bloom hits, and FALSE POSITIVES
    vs the exact key set — the approximation error itself is under the
    hash gate, because the md5-bit construction is replayed by the
    oracle.  Scale: build is one explode+distinct over the key set;
    probes test the distinct-key frame and broadcast the verdict — the
    fact side never shuffles."""
    from vector_spark.operators.probabilistic import (
        bloom_build,
        bloom_contains,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    keys = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= 10)
        .select("user_id")
    )
    bits = bloom_build(keys, "user_id", m_bits=256, k=2)
    probed = bloom_contains(ev, bits, "user_id", m_bits=256, k=2)
    exact = keys.withColumn("_exact", F.lit(True))
    probed = probed.join(F.broadcast(exact), "user_id", "left")
    return probed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("bloom_hit").cast("long")).alias("n_bloom_hits"),
        F.sum(
            (F.col("bloom_hit") & F.col("_exact").isNull()).cast("long")
        ).alias("n_false_positives"),
    )


@register(
    "cuckoo_table_membership",
    f"""
WITH base AS (
  SELECT user_id AS key, min(ts) AS _ord FROM events
  WHERE user_id IS NOT NULL GROUP BY user_id
),
t AS (
  SELECT key, _ord,
         {_B60.format(e="concat_ws(':', 'cfp', CAST(key AS VARCHAR))")}
           % 4096 AS fp,
         {_B60.format(e="concat_ws(':', 'cb1', CAST(key AS VARCHAR))")}
           % 64 AS b1
  FROM base
),
t2 AS (
  SELECT *,
         xor(b1, {_B60.format(e="concat_ws(':', 'cb2', CAST(fp AS VARCHAR))")})
           % 64 AS b2,
         row_number() OVER (PARTITION BY b1 ORDER BY _ord, key) AS rn1
  FROM t
),
p1 AS (SELECT key, fp, b1 AS bucket FROM t2 WHERE rn1 <= 2),
occ AS (SELECT bucket, count(*) AS o FROM p1 GROUP BY bucket),
ov AS (
  SELECT t2.key, t2.fp, t2.b2, coalesce(occ.o, 0) AS o,
         row_number() OVER (PARTITION BY t2.b2 ORDER BY t2._ord, t2.key)
           AS rn2
  FROM t2 LEFT JOIN occ ON occ.bucket = t2.b2
  WHERE t2.rn1 > 2
),
p2 AS (SELECT key, fp, b2 AS bucket FROM ov WHERE rn2 + o <= 2),
placed AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_placed,
         CAST((SELECT count(*) FROM base) - count(*) AS BIGINT) AS n_dropped
  FROM placed
),
stored AS (SELECT DISTINCT bucket, fp FROM placed),
cand AS (SELECT key, fp, unnest([b1, b2]) AS bucket FROM t2),
hits AS (SELECT DISTINCT key FROM cand JOIN stored USING (bucket, fp))
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (WHERE h.key IS NOT NULL) AS BIGINT)
         AS n_cuckoo_hits,
       CAST(sum(t.fp) AS BIGINT) AS fp_checksum,
       any_value(s.n_placed) AS n_placed,
       any_value(s.n_dropped) AS n_dropped
FROM events e
LEFT JOIN hits h ON e.user_id = h.key
LEFT JOIN t ON e.user_id = t.key
CROSS JOIN stats s
GROUP BY e.event_type""",
)
def q_cuckoo_table_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cuckoo enrichment table (operators/probabilistic.py — the
    cuckoo_table.rs re-spec): all user ids insert in first-seen order
    into a 64-bucket x 2-slot filter of 12-bit fingerprints; overflow
    beyond both candidate buckets is DROPPED and accounted (n_dropped,
    like the reference's max_kicks insert failure).  Every event then
    probes its user_id; the per-type hit counts, the probe fingerprint
    checksum, and the placed/dropped totals all sit under the hash
    gate — the oracle replays placement (two windowed phases),
    fingerprints, and lookups from the same md5 constructions."""
    from vector_spark.operators.probabilistic import (
        cuckoo_build,
        cuckoo_contains,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    table = cuckoo_build(
        ev, "user_id", n_buckets=64, bucket_size=2,
        fingerprint_bits=12, order_col="ts",
    )
    probed = cuckoo_contains(
        ev, table, "user_id", n_buckets=64, fingerprint_bits=12,
    )
    stats = table.agg(
        F.sum(F.col("placed").cast("long")).alias("n_placed"),
        F.sum((~F.col("placed")).cast("long")).alias("n_dropped"),
    )
    return (
        probed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("cuckoo_hit").cast("long")).alias("n_cuckoo_hits"),
            F.sum("fingerprint").alias("fp_checksum"),
        )
        .crossJoin(F.broadcast(stats))
    )


@register(
    "tag_cardinality_probabilistic",
    f"""
WITH vals AS (
  SELECT user_id, min(ts) AS first_ts FROM events
  WHERE user_id IS NOT NULL GROUP BY user_id
),
ins AS (
  SELECT user_id FROM (
    SELECT user_id, row_number() OVER (ORDER BY first_ts, user_id) AS r
    FROM vals
  ) WHERE r <= 20
),
bits AS (
  SELECT DISTINCT pos FROM (
    SELECT {_bloom_pos_sql(0, 'user_id', 128)} AS pos FROM ins
    UNION ALL
    SELECT {_bloom_pos_sql(1, 'user_id', 128)} AS pos FROM ins
  )
),
fp AS (
  SELECT user_id FROM (
    SELECT v.user_id,
           unnest([{_bloom_pos_sql(0, 'v.user_id', 128)},
                   {_bloom_pos_sql(1, 'v.user_id', 128)}]) AS pos
    FROM vals v LEFT JOIN ins USING (user_id) WHERE ins.user_id IS NULL
  ) p JOIN bits USING (pos)
  GROUP BY user_id HAVING count(*) = 2
),
ok AS (SELECT user_id FROM ins UNION ALL SELECT user_id FROM fp)
SELECT CASE WHEN e.user_id IN (SELECT user_id FROM ok)
            THEN e.user_id END AS user_id,
       CAST(count(*) AS BIGINT) AS n
FROM events e GROUP BY 1""",
)
def q_tag_cardinality_probabilistic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Probabilistic tag_cardinality_limit (config.rs:125-148 /
    tag_value_set.rs): the first 20 first-seen user ids insert into a
    128-bit / 2-hash bloom cache; later ids whose bit positions ALL
    collide with inserted bits still pass (the mode's documented
    false-positive trade), everything else is nulled.  The oracle
    re-derives the insert set, the bit cache, and every false positive
    from the same md5 construction, so the approximation behavior —
    not just the exact-mode subset — is under the hash gate."""
    from vector_spark.operators.metrics import tag_cardinality_limit

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "user_id"
    )
    limited = tag_cardinality_limit(
        ev, ["user_id"], value_limit=20,
        mode="probabilistic", cache_bits=128, bloom_k=2,
    )
    return limited.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "vrl_decode_lines",
    """
WITH raw AS (
  SELECT CASE WHEN event_id % 97 = 0 THEN concat('garbage ', CAST(event_id AS VARCHAR))
         ELSE concat('type=', event_type,
                     ' value=', CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS VARCHAR),
                     ' user=', CAST(coalesce(user_id, -1) AS VARCHAR))
         END AS message
  FROM events
),
d AS (
  SELECT regexp_extract(message, 'type=([^ ]+)', 1) AS etype,
         try_cast(regexp_extract(message, 'value=([^ ]+)', 1) AS BIGINT) AS v100,
         try_cast(regexp_extract(message, 'user=([^ ]+)', 1) AS BIGINT) AS user
  FROM raw
)
SELECT etype,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(v100) AS BIGINT) AS sum_v100,
       CAST(sum(user) AS BIGINT) AS sum_user
FROM d WHERE etype <> ''
GROUP BY etype""",
)
def q_vrl_decode_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``decoding: vrl`` (sources/readers.py:decode_vrl — the
    decoding/format/vrl.rs re-spec): render events as raw log lines
    (with a deterministic slice of GARBAGE lines every 97th event),
    then decode the byte stream back by running a program over
    ``{message: <line>}`` — field extraction, typed casts, and the
    error channel (unparseable lines are decoding errors and are
    dropped, not crashed on).  Per-type counts and checksums of the
    round-tripped values sit under the hash gate."""
    from vector_spark.sources.readers import decode_vrl

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    lines = ev.select(
        F.when(
            F.col("event_id") % 97 == 0,
            F.concat(F.lit("garbage "), F.col("event_id").cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit("type="), F.col("event_type"),
                F.lit(" value="),
                F.floor(F.col("value") * 100 + 0.5).cast("long")
                .cast("string"),
                F.lit(" user="),
                F.coalesce(F.col("user_id"), F.lit(-1)).cast("string"),
            )
        )
        .alias("value")
    )
    decoded = decode_vrl(
        lines,
        {
            "assignments": {
                "etype": "regexp_extract(message, 'type=([^ ]+)', 1)",
                "v100": "try_cast(regexp_extract(message, 'value=([^ ]+)', 1) AS BIGINT)",
                "user": "try_cast(regexp_extract(message, 'user=([^ ]+)', 1) AS BIGINT)",
            },
            "error_when": "etype = ''",
            "deletions": ["message"],
        },
    )
    return decoded.groupBy("etype").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v100").alias("sum_v100"),
        F.sum("user").alias("sum_user"),
    )
