"""Deterministic synthetic `transcripts` table, portable across engines.

The pipeline's primary input (BASELINE.json input_hint) is an Iceberg
table ``transcripts(conv_id string, turn_idx int, role string,
text string, tool string, ts timestamp)`` of multi-turn conversation /
agent transcripts.  No such table ships in /root/testdata, so we
synthesise it deterministically — ONE SQL template that renders for both
Spark SQL and DuckDB, so the driver's DuckDB oracle can rebuild the
byte-identical table and every transcript operator gets a real
correctness gate.

Determinism: all pseudo-randomness is integer LCG mixes of the row id
(distinct multiplier/modulus primes per field) — no engine RNG, no
locale- or time-dependent functions.  Text lines follow the reference's
demo_logs formats (/root/reference/src/sources/demo_logs.rs:102-140):
apache_common 60%, JSON 25%, logfmt 10%, garbage 5% (the parse stage's
error channel).  Skew: ~30% of turns land in the 1% "hot" conversations
to exercise salted repartitioning.

Scale: rows = sf * 6_000_000 (sf0.001→6k smoke, sf0.01→60k oracle,
sf0.1→600k bench; bench.py also generates 6M+ directly).  Generation is
`range(n)` + column expressions — fully parallel, no driver loops, so
the same generator produces the 10^12-turn shape on a cluster.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

EPOCH_2026 = 1767225600  # 2026-01-01T00:00:00Z

#: rows per unit scale factor (sf0.01 → 60_000 turns ≈ 2_000 conversations)
ROWS_PER_SF = 6_000_000

_TEMPLATE = """
WITH seq AS ({seq_src}),
r AS (
  SELECT
    id,
    (id * 2654435761 + 123456789) % 4294967291 AS r1,
    (id * 1103515245 + 12345)     % 2147483647 AS r2,
    (id * 69069 + 362437)         % 2147483629 AS r3,
    (id * 1664525 + 1013904223)   % 2147483563 AS r4,
    (id * 22695477 + 7777777)     % 2147483423 AS r5,
    (id * 134775813 + 99991)      % 2147483399 AS r6
  FROM seq
),
base AS (
  SELECT id, r1, r2, r3, r4, r5, r6,
    CASE WHEN r1 % 1000 < 300 THEN r2 % {n_hot}
         ELSE {n_hot} + (r2 % {n_cold}) END AS conv_num,
    CASE WHEN r3 % 100 < 40 THEN 'user'
         WHEN r3 % 100 < 80 THEN 'assistant'
         WHEN r3 % 100 < 95 THEN 'tool'
         ELSE 'system' END AS role,
    r1 % 100 AS fmt,
    r4 % 3000 AS latency_ms,
    r5 % 200000 AS nbytes,
    CASE WHEN r6 % 100 < 70 THEN 200 WHEN r6 % 100 < 80 THEN 301
         WHEN r6 % 100 < 90 THEN 404 WHEN r6 % 100 < 97 THEN 500
         ELSE 503 END AS status,
    CASE WHEN r6 % 100 < 80 THEN 'info' WHEN r6 % 100 < 90 THEN 'warn'
         WHEN r6 % 100 < 98 THEN 'error' ELSE 'debug' END AS level,
    CASE r5 % 5 WHEN 0 THEN 'request completed'
         WHEN 1 THEN 'timeout waiting for upstream'
         WHEN 2 THEN 'cache miss'
         WHEN 3 THEN 'retrying connection'
         ELSE 'upstream returned ok' END AS msg,
    CASE r4 % 5 WHEN 0 THEN 'api' WHEN 1 THEN 'auth' WHEN 2 THEN 'ingest'
         WHEN 3 THEN 'billing' ELSE 'frontend' END AS service
  FROM r
),
turns AS (
  SELECT *,
    CAST(ROW_NUMBER() OVER (PARTITION BY conv_num ORDER BY id) - 1 AS INTEGER)
      AS turn_idx
  FROM base
),
t AS (
  SELECT *,
    CASE WHEN role = 'tool' OR (role = 'assistant' AND r5 % 10 < 3)
         THEN CASE r4 % 4 WHEN 0 THEN 'search' WHEN 1 THEN 'python'
              WHEN 2 THEN 'browser' ELSE 'sql' END
         ELSE 'none' END AS tool,
    {ts_expr} AS ts
  FROM turns
)
SELECT
  concat('conv-', lpad(CAST(conv_num AS {str_t}), 8, '0')) AS conv_id,
  turn_idx,
  role,
  CASE
    WHEN fmt < 60 THEN concat(
      '10.', CAST(r2 % 256 AS {str_t}), '.', CAST(r3 % 256 AS {str_t}),
      '.', CAST(r4 % 256 AS {str_t}),
      ' - user', CAST(r5 % 1000 AS {str_t}),
      ' [', {httpdate}, '] "',
      CASE r3 % 4 WHEN 0 THEN 'GET' WHEN 1 THEN 'POST'
           WHEN 2 THEN 'PUT' ELSE 'DELETE' END,
      ' /', service, '/item/', CAST(r6 % 10000 AS {str_t}),
      ' HTTP/1.1" ', CAST(status AS {str_t}), ' ', CAST(nbytes AS {str_t}))
    WHEN fmt < 85 THEN concat(
      '{{"level": "', level, '", "msg": "', msg, '", "latency_ms": ',
      CAST(latency_ms AS {str_t}), ', "service": "', service, '"}}')
    WHEN fmt < 95 THEN concat(
      'level=', level, ' code=E', lpad(CAST(r6 % 1000 AS {str_t}), 3, '0'),
      ' retry=', CASE WHEN r4 % 2 = 0 THEN 'true' ELSE 'false' END,
      ' msg="', msg, '"')
    ELSE concat('~~#', CAST(id AS {str_t}), ' raw noise :: not parseable ##')
  END AS text,
  tool,
  ts
FROM t
"""

_TS_BASE = (
    f"{EPOCH_2026} + (conv_num % 86400) * 37 + turn_idx * 7"
)


def _conv_counts(n_turns: int) -> tuple[int, int]:
    n_convs = max(4, n_turns // 30)
    n_hot = max(1, n_convs // 100)
    return n_hot, n_convs - n_hot


def spark_transcripts_sql(n_turns: int) -> str:
    """Spark-SQL text of the generator for ``n_turns`` rows."""
    n_hot, n_cold = _conv_counts(n_turns)
    return _TEMPLATE.format(
        seq_src=f"SELECT id FROM range({n_turns})",
        n_hot=n_hot,
        n_cold=n_cold,
        ts_expr=f"timestamp_seconds({_TS_BASE})",
        str_t="STRING",
        httpdate="concat(date_format(ts, 'dd/MMM/yyyy:HH:mm:ss'), ' +0000')",
    )


def duckdb_transcripts_sql(n_turns: int) -> str:
    """DuckDB text of the SAME generator — the oracle side."""
    n_hot, n_cold = _conv_counts(n_turns)
    return _TEMPLATE.format(
        seq_src=f"SELECT range AS id FROM range({n_turns})",
        n_hot=n_hot,
        n_cold=n_cold,
        ts_expr=f"make_timestamp(({_TS_BASE}) * 1000000)",
        str_t="VARCHAR",
        httpdate="concat(strftime(ts, '%d/%b/%Y:%H:%M:%S'), ' +0000')",
    )


def duckdb_transcripts_cte(n_turns: int) -> str:
    """``WITH transcripts AS (...)`` prefix for oracle queries."""
    return f"WITH transcripts AS (\n{duckdb_transcripts_sql(n_turns)}\n)"


def n_turns_for_sf_dir(sf_dir: str) -> int:
    """Scale from the testdata dir name: .../sf0.01 → 60_000 turns."""
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    sf = float(m.group(1)) if m else 0.01
    return max(1000, int(round(sf * ROWS_PER_SF)))


def transcripts_df(spark: SparkSession, n_turns: int) -> DataFrame:
    """The generator as a lazy plan (no materialization).

    NOTE: downstream regex parsing over this raw plan re-inlines the
    large text-construction expression into every extracted field and
    blows up whole-stage codegen — use :func:`transcripts_table` for
    anything that consumes `text`.
    """
    return spark.sql(spark_transcripts_sql(n_turns))


CACHE_DIR = os.environ.get("VECTOR_SPARK_CACHE", "/tmp/vector_spark_cache")


def transcripts_table(
    spark: SparkSession, n_turns: int, cache_dir: str | None = None
) -> DataFrame:
    """Materialized transcripts table (write-once parquet cache).

    Production ingests from an Iceberg/parquet table; materializing the
    synthetic data reproduces that shape AND severs the expression
    lineage so the parse stage scans plain columns (pushdown + codegen
    stay small)."""
    cache_dir = cache_dir or CACHE_DIR
    path = os.path.join(cache_dir, f"transcripts_{n_turns}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # write enough files that the scan stage gets SEVERAL tasks per
        # core at any plausible core count: the parse stage is the
        # CPU-heavy leg, and a task count near the core count quantizes
        # into ragged waves (measured: 10 scan tasks on 8 executors ran
        # the 19.2M pipeline at 0.58 scaling efficiency — two waves,
        # the second 2/8 occupied; ~3 tasks/core restores 0.95+).
        # ~10k rows (~1 MB) per file keeps per-file overhead trivial.
        nfiles = min(256, max(8, n_turns // 10_000))
        transcripts_df(spark, n_turns).repartition(nfiles).write.mode(
            "overwrite"
        ).parquet(path)
    return spark.read.parquet(path)


def load_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcript table at the scale implied by an sf dir (driver contract)."""
    return transcripts_table(spark, n_turns_for_sf_dir(sf_dir))
