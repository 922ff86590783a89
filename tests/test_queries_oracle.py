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


def test_no_hugeint_oracle_columns(ddb):
    """Regression for the round-4 red row: DuckDB widens sum(BIGINT)
    to HUGEINT (int128), a dtype Spark cannot produce, so the driver's
    dtype-sensitive value hash fails even when every value matches
    (doc_topk_per_source, r4).  Every oracle result column must be a
    type Spark can mirror — no HUGEINT anywhere."""
    bad = []
    for name in ORACLED:
        rel = ddb.sql(_REGISTRY[name][1])
        for col, typ in zip(rel.columns, rel.types):
            if "HUGEINT" in str(typ).upper():
                bad.append((name, col, str(typ)))
    assert not bad, f"HUGEINT oracle columns (cast to BIGINT): {bad}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert df.columns == [
        "sink", "window_start", "n", "sum_bytes", "sum_latency",
        "min_latency", "max_latency", "n_convs",
    ]


def test_classifier_oracles_null_lang_and_source(spark, tmp_path):
    """Regression for the round-3 advice: the classifier oracles must
    agree with the engine on NULL-label and NULL-group semantics, not
    merely on corpora that happen to contain no NULLs.  Runs both
    sides on a tampered documents table carrying NULL-lang seed rows
    (must enter neither class nor the vocabulary) and NULL-source rows
    (must never rank in a top-k partition)."""
    import os

    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.conftest import SF_DIR, assert_frames_match

    src = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    pdf = src.to_pandas()
    hi = int(pdf["doc_id"].max()) + 2  # +2 keeps parity control easy
    null_lang = pdf.head(20).copy()
    # even doc_ids so these rows land INSIDE the even-id seed half
    null_lang["doc_id"] = [hi + 2 * i for i in range(20)]
    null_lang["lang"] = None
    null_src = pdf.head(20).copy()
    null_src["doc_id"] = [hi + 40 + 2 * i for i in range(20)]
    null_src["source"] = None
    out = pd.concat([pdf, null_lang, null_src], ignore_index=True)
    path = tmp_path / "documents.parquet"
    pq.write_table(
        pa.Table.from_pandas(
            out, schema=src.schema.remove_metadata(), preserve_index=False
        ),
        path,
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    try:
        for name in ("doc_classifier_scores", "doc_topk_per_source"):
            fn, oracle = _REGISTRY[name]
            assert_frames_match(fn(spark, str(tmp_path)), con.sql(oracle))
    finally:
        con.close()
