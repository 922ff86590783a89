"""Driver contract for the spark-graft builder (PySpark target).

entry(spark) runs the flagship parse→enrich→route→aggregate pipeline on
the sf0.001-scale transcripts table; queries()/oracle_sql() expose every
implemented operator (exact counts: ``len(queries())`` registered,
``len(oracle_sql())`` with DuckDB oracles — the registry is the single
source of truth) in an explicit priority order that rotates queries
through the driver's 50-query verification window each round
(vector_spark.registry._PRIORITY).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-sink windowed aggregates of the full pipeline at
    sf0.001 — one frame with (sink, window_start, n, sum_bytes,
    sum_latency, n_convs)."""
    from vector_spark.data.transcripts import load_transcripts
    from vector_spark.plans.transcript_pipeline import (
        enriched_transcripts,
        fused_aggregates,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    transcripts = load_transcripts(spark, "/root/testdata/sf0.001")
    enriched, _dropped = enriched_transcripts(spark, transcripts)
    return fused_aggregates(enriched)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import vector_spark.queries  # noqa: F401 — populates the registry
    import vector_spark.queries_datapipe  # noqa: F401

    from vector_spark.registry import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    import vector_spark.queries  # noqa: F401
    import vector_spark.queries_datapipe  # noqa: F401

    from vector_spark.registry import oracle_sql as _o

    return _o()
