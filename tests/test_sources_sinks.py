"""Sources/codecs/line_agg + sink fan-out with routed-row equality
(the north rule's per-sink write check)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from vector_spark.data.transcripts import transcripts_table
from vector_spark.operators.route import route
from vector_spark.plans.transcript_pipeline import ROUTES, enriched_transcripts
from vector_spark.sources.readers import line_agg, read_source, read_text_decoded
from vector_spark.sources.sinks import blackhole, fan_out_write

OUT = "/tmp/vector_spark_test_sinks"


@pytest.fixture
def outdir():
    shutil.rmtree(OUT, ignore_errors=True)
    yield OUT
    shutil.rmtree(OUT, ignore_errors=True)


def test_read_source_formats(spark, tmp_path):
    t = transcripts_table(spark, 1000)
    assert read_source(spark, "parquet", "/root/testdata/sf0.001/events.parquet").count() == 1000
    p = str(tmp_path / "j")
    t.limit(50).write.json(p)
    assert read_source(spark, "json", p).count() == 50
    with pytest.raises(RuntimeError, match="kafka source requires"):
        read_source(spark, "kafka", {"kafka.bootstrap.servers": "none:9092"})


def test_text_codecs(spark, tmp_path):
    lines = [
        "<34>Oct 11 22:14:15 h1 app[1]: msg one",
        "<13>Oct 11 22:14:16 h2 app[2]: msg two",
    ]
    p = str(tmp_path / "syslog.txt")
    with open(p, "w") as f:
        f.write("\n".join(lines))
    df = read_text_decoded(spark, p, "syslog")
    rows = df.select("decoded.*").orderBy("procid").collect()
    assert rows[0]["hostname"] == "h1" and rows[0]["severity"] == 2
    assert rows[1]["facility"] == 1

    p2 = str(tmp_path / "logfmt.txt")
    with open(p2, "w") as f:
        f.write("a=1 b=two\nx=9 y=z")
    kv = read_text_decoded(spark, p2, "logfmt").select("decoded").collect()
    assert {"a": "1", "b": "two"} in [r["decoded"] for r in kv]


def test_line_agg_continue_through(spark):
    rows = [
        (1, "ERROR boom"),
        (2, "  at frame1"),
        (3, "  at frame2"),
        (4, "ERROR second"),
        (5, "  at frameX"),
    ]
    df = spark.createDataFrame(rows, "line_no int, value string")
    out = line_agg(df, r"^\S", order_by="line_no").orderBy("line_no").collect()
    assert len(out) == 2
    assert out[0]["message"] == "ERROR boom\n  at frame1\n  at frame2"
    assert out[1]["message"] == "ERROR second\n  at frameX"


def test_line_agg_halt_with(spark):
    rows = [(1, "part a"), (2, "part b END"), (3, "next a"), (4, "next b END")]
    df = spark.createDataFrame(rows, "line_no int, value string")
    out = line_agg(
        df, start_pattern=r"END$", mode="halt_with", order_by="line_no"
    ).orderBy("line_no").collect()
    assert [r["message"] for r in out] == [
        "part a\npart b END",
        "next a\nnext b END",
    ]


def test_fan_out_routed_row_equality(spark, outdir):
    """Union of written sink tables == predicate-filtered input with
    clone-per-match multiplicity (route.rs:40-55 count parity)."""
    t = transcripts_table(spark, 6000)
    enriched, _ = enriched_transcripts(spark, t)
    enriched = enriched.persist()
    sinks = route(enriched, ROUTES)
    counts = fan_out_write(sinks, outdir)

    for name, cond in ROUTES.items():
        assert counts[name] == enriched.filter(cond).count()
    unmatched = counts["_unmatched"]
    clone_total = sum(counts[n] for n in ROUTES)
    assert clone_total + unmatched >= enriched.count()  # clones inflate
    # every written row is found in its source predicate set (row equality)
    written = spark.read.parquet(f"{outdir}/sink_errors")
    src = enriched.filter(ROUTES["sink_errors"])
    assert written.exceptAll(src).count() == 0
    assert src.exceptAll(written).count() == 0
    enriched.unpersist()


def test_blackhole(spark):
    assert blackhole(transcripts_table(spark, 1000)) == 1000
