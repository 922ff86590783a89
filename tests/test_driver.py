"""Pipeline driver: checkpoint/resume, manifest metrics, graph checks,
salted repartition (north rule: resumable from checkpoint with
per-partition lineage + metrics; skew handled explicitly)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from vector_spark.data.transcripts import transcripts_table
from vector_spark.plans.driver import Pipeline, PipelineGraphError, Stage, add_lineage
from vector_spark.plans.skew import partition_histogram, salted_repartition

CKPT = "/tmp/vector_spark_test_ckpt"


@pytest.fixture
def ckpt():
    shutil.rmtree(CKPT, ignore_errors=True)
    yield CKPT
    shutil.rmtree(CKPT, ignore_errors=True)


def _build(calls):
    def parse(spark, t):
        calls.append("parse")
        from vector_spark.functions.parse import parse_transcripts

        return parse_transcripts(t).select(
            "conv_id", "turn_idx", "role", "tool", "ts", "format", "parse_ok", "parsed.*"
        )

    def errors(spark, parsed):
        calls.append("errors")
        return parsed.filter("level = 'error' OR http_status >= 500")

    def agg(spark, errs):
        calls.append("agg")
        return errs.groupBy("role").agg(F.count(F.lit(1)).alias("n"))

    return [
        Stage("parse", parse, parents=["transcripts"]),
        Stage("errors", errors, parents=["parse"]),
        Stage("agg", agg, parents=["errors"]),
    ]


def test_run_and_resume(spark, ckpt):
    t = transcripts_table(spark, 6000)
    calls: list[str] = []
    p = Pipeline(_build(calls), ckpt, inputs=["transcripts"])
    res1 = p.run(spark, {"transcripts": t})
    n1 = res1["agg"].collect()
    assert calls == ["parse", "errors", "agg"]

    # full resume: nothing recomputes
    calls.clear()
    p2 = Pipeline(_build(calls), ckpt, inputs=["transcripts"])
    res2 = p2.run(spark, {"transcripts": t})
    assert calls == []
    assert sorted(map(tuple, res2["agg"].collect())) == sorted(map(tuple, n1))

    # invalidate the middle stage: only it and its descendant rerun
    calls.clear()
    p3 = Pipeline(_build(calls), ckpt, inputs=["transcripts"])
    p3.invalidate("errors", "agg")
    res3 = p3.run(spark, {"transcripts": t})
    assert calls == ["errors", "agg"]
    assert sorted(map(tuple, res3["agg"].collect())) == sorted(map(tuple, n1))


def test_manifest_metrics(spark, ckpt):
    t = transcripts_table(spark, 6000)
    p = Pipeline(_build([]), ckpt, inputs=["transcripts"])
    p.run(spark, {"transcripts": t})
    m = p.manifest()
    commits = [r for r in m if r["event"] == "commit"]
    assert [c["stage"] for c in commits] == ["parse", "errors", "agg"]
    for c in commits:
        assert c["rows"] == sum(c["partitions"].values())
        assert c["wall_s"] > 0
    assert commits[0]["rows"] == 6000
    assert commits[1]["parents"] == ["parse"]


def test_graph_validation(ckpt):
    with pytest.raises(PipelineGraphError, match="unknown inputs"):
        Pipeline([Stage("a", lambda s: None, parents=["nope"])], ckpt)
    with pytest.raises(PipelineGraphError, match="cycle"):
        Pipeline(
            [
                Stage("a", lambda s: None, parents=["b"]),
                Stage("b", lambda s: None, parents=["a"]),
            ],
            ckpt,
        )


def test_lineage_columns(spark):
    t = transcripts_table(spark, 1000)
    df = add_lineage(t, source="transcripts", stage="ingest")
    row = df.select("_source", "_stage").first()
    assert (row["_source"], row["_stage"]) == ("transcripts", "ingest")


def test_salted_repartition_spreads_hot_conv(spark):
    t = transcripts_table(spark, 60000)
    # hot conversation = most rows
    hot = t.groupBy("conv_id").count().orderBy(F.desc("count")).first()
    hot_rows = t.filter(F.col("conv_id") == hot["conv_id"])

    plain = hot_rows.repartition(16, "conv_id")
    h_plain = [n for _, n in partition_histogram(plain) if n > 0]
    assert len(h_plain) == 1  # all rows of the key land in ONE partition

    salted = salted_repartition(hot_rows, ["conv_id"], 16, salt_buckets=8)
    h_salted = [n for _, n in partition_histogram(salted) if n > 0]
    assert len(h_salted) >= 4  # spread over multiple partitions
    assert max(h_salted) < hot["count"]


def test_metrics_query_functions(spark, ckpt):
    """VRL metrics-query surface (get/find/aggregate_vector_metrics)
    over the pipeline's own manifest telemetry."""
    from vector_spark.functions.metrics_query import MetricsStorage

    calls = []
    pipe = Pipeline(_build(calls), CKPT, inputs=["transcripts"])
    t = transcripts_table(spark, 2000)
    results = pipe.run(spark, {"transcripts": t})

    ms = MetricsStorage()
    ms.refresh_from_pipeline(pipe)

    m = ms.get_metric("stage_rows_total", {"component_id": "parse"})
    assert m is not None and m["value"] == 2000.0
    assert ms.get_metric("stage_rows_total", {"component_id": "nope"}) is None
    # find: one per committed stage
    found = ms.find_metrics("stage_rows_total")
    assert {f["tags"]["component_id"] for f in found} == {
        "parse", "errors", "agg"
    }
    # aggregate: sum of rows across stages equals manifest totals
    total = ms.aggregate_metrics("sum", "stage_rows_total")
    assert total == sum(f["value"] for f in found)
    assert ms.aggregate_metrics("max", "stage_rows_total") == 2000.0
    assert ms.aggregate_metrics("avg", "nonexistent") is None
    with pytest.raises(ValueError):
        ms.aggregate_metrics("median", "stage_rows_total")
    # joinable form
    df = ms.as_df(spark)
    assert df.filter("name = 'stage_wall_seconds'").count() == 3
    assert results["agg"].count() > 0


def test_invalidate_cascades_to_descendants(spark, ckpt):
    """Invalidating a stage must also invalidate committed descendants,
    or resume would serve results computed from the OLD parent."""
    calls: list = []
    p = Pipeline(_build(calls), CKPT, inputs=["transcripts"])
    t = transcripts_table(spark, 2000)
    p.run(spark, {"transcripts": t})
    assert calls == ["parse", "errors", "agg"]

    p.invalidate("parse")
    calls.clear()
    p2 = Pipeline(_build(calls), CKPT, inputs=["transcripts"])
    p2.run(spark, {"transcripts": t})
    # everything downstream of parse recomputed, nothing served stale
    assert calls == ["parse", "errors", "agg"]

    # invalidating a leaf recomputes only the leaf
    p2.invalidate("agg")
    calls.clear()
    p3 = Pipeline(_build(calls), CKPT, inputs=["transcripts"])
    p3.run(spark, {"transcripts": t})
    assert calls == ["agg"]


def test_scale_chain_semantics(spark):
    """The reference's 12-step scaling pipeline re-expressed
    (regression/cases/scale_sync_only_8_cpu/vector/vector.yaml): every
    transform's effect verified on the synthetic load shape."""
    from vector_spark.plans.scale_chain import scale_chain, synth_scale_events

    src = synth_scale_events(spark, 4000)
    out = scale_chain(src).persist()
    rows = out.limit(200).collect()
    assert rows, "sampling removed everything"
    for r in rows:
        assert r["raw_message_obj"]["app"] == "demo"        # parse_json
        assert r["http"]["status"] in (200, 500)            # parse_grok
        assert r["raw_xml_obj"]["kind"] == "sync"           # parse_xml
        assert r["pipeline_stage"] == "ingested"            # add_fields
        assert r["src_host"].startswith("host-")            # rename
        assert r["geo_region"] == "us-east-1"
        tags = list(r["ddtags"])                            # ddtags filter
        assert all(not t.startswith(("filename:", "container_id:"))
                   for t in tags)
        assert any(t.startswith("env:") for t in tags)
        assert r["processed_by"] == "scale_sync_only"
    # severity: level=info and ~10% of messages carry status 500 but
    # "error" only triggers on message text — none here say 'error'
    assert out.filter("severity_class <> 'info'").count() == 0
    # sample halves per service (hash-consistent, ±
    n_in = src.count()
    n_out = out.count()
    assert abs(n_out / n_in - 0.5) < 0.05
    # dropped fields gone
    assert "span_id" not in out.columns
    assert "region_canonical" not in out.columns
    # one narrow stage: no shuffle anywhere in the chain
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    out.unpersist()
