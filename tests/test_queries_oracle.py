"""Every registered driver query vs its DuckDB oracle at sf0.01 — the
same comparison the driver's CORRECTNESS gate runs."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_frames_match
import vector_spark.queries  # noqa: F401 — populate registry
import vector_spark.queries_datapipe  # noqa: F401
from vector_spark.registry import _REGISTRY

ORACLED = sorted(k for k, v in _REGISTRY.items() if v[1] is not None)


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, ddb, name):
    fn, oracle = _REGISTRY[name]
    sdf = fn(spark, SF_DIR)
    assert_frames_match(sdf, ddb.sql(oracle))


def test_driver_window_covers_datapipe_suite():
    """The driver's CORRECTNESS gate checks the first 50 registered
    queries; the r2 verdict found the datapipe suite starved out of
    that window.  Pin the invariant: every doc_*/emb_* query sits
    inside the first 50 returned by queries()."""
    import __spark_entry__ as e

    from vector_spark.registry import _PRIORITY

    window = list(e.queries())[:50]
    # the core datapipe set (the r2 verdict's named rows + the corpus
    # chain) must be driver-verified; later doc_/emb_ additions beyond
    # the 50-slot window stay under the local oracle suite
    datapipe = [k for k in _PRIORITY if k.startswith(("doc_", "emb_"))]
    assert len(datapipe) >= 10, "datapipe core must stay in the priority list"
    missing = [k for k in datapipe if k not in window]
    assert not missing, f"datapipe queries outside driver window: {missing}"
    # the round-3 capability queries must be driver-verified too
    for q in ("grok_apache_combined", "octet_framed_syslog",
              "datadog_tags_facets"):
        assert q in window, f"{q} outside driver window"
    # ordering must not drop or duplicate anything
    assert sorted(e.queries()) == sorted(_REGISTRY)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert df.columns == [
        "sink", "window_start", "n", "sum_bytes", "sum_latency",
        "min_latency", "max_latency", "n_convs",
    ]
