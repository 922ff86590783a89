"""Shared test fixtures: one SparkSession per run + a DuckDB oracle
comparator that mirrors the driver's correctness gate (row count, schema
column names, order-insensitive value comparison)."""

from __future__ import annotations

import math

import numpy as np
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    s = get_spark("vector_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


def _norm_cell(v):
    if v is None:
        return None
    if not isinstance(v, (list, tuple, dict)):
        try:
            if pd.isna(v):
                return None
        except (TypeError, ValueError):
            pass
    if isinstance(v, (bool, np.bool_)):
        return bool(v)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return None
        if v.is_integer() and abs(v) < 2**53:
            return str(int(v))
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_frame(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def assert_frames_match(spark_df, duck_rel, limit_diff: int = 5):
    """Order-insensitive equality, columns sorted by name — the same
    contract the driver's CORRECTNESS gate applies."""
    spdf = spark_df.toPandas()
    ddf = duck_rel if isinstance(duck_rel, pd.DataFrame) else duck_rel.df()
    assert len(spdf) == len(ddf), f"row count {len(spdf)} != oracle {len(ddf)}"
    assert sorted(spdf.columns) == sorted(ddf.columns), (
        f"columns {sorted(spdf.columns)} != oracle {sorted(ddf.columns)}"
    )
    a, b = _norm_frame(spdf), _norm_frame(ddf)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"value mismatch (first {limit_diff}): {mismatches[:limit_diff]}"
