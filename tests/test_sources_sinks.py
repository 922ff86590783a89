"""Sources/codecs/line_agg + sink fan-out with routed-row equality
(the north rule's per-sink write check)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from vector_spark.data.transcripts import transcripts_table
from vector_spark.operators.route import route
from vector_spark.plans.transcript_pipeline import ROUTES, enriched_transcripts
from vector_spark.sources.readers import (
    line_agg,
    line_agg_exact,
    read_source,
    read_text_decoded,
)
from vector_spark.sources.sinks import blackhole, fan_out_write

OUT = "/tmp/vector_spark_test_sinks"


@pytest.fixture
def outdir():
    shutil.rmtree(OUT, ignore_errors=True)
    yield OUT
    shutil.rmtree(OUT, ignore_errors=True)


def test_octet_counting_framing(spark):
    """RFC6587 octet counting: encode→concat→decode recovers frames
    byte-exactly, including frames containing newlines and digits; a
    non-digit prefix falls back to newline framing; oversized frames
    are discarded (the reference's Discarding state)."""
    from vector_spark.sources.readers import octet_encode, octet_frames

    msgs = ["hello world", "line\nwith newline", "123 starts with digits", "x"]
    df = spark.createDataFrame([(m,) for m in msgs], "msg string")
    payload = df.agg(
        F.concat_ws("", F.collect_list(octet_encode(F.col("msg")))).alias("p")
    )
    [row] = payload.select(octet_frames(F.col("p")).alias("f")).collect()
    assert row["f"] == msgs

    # fallback: plain newline-framed payload (no octet counts)
    [r2] = spark.createDataFrame(
        [("plain one\nplain two",)], "p string"
    ).select(octet_frames(F.col("p")).alias("f")).collect()
    assert r2["f"] == ["plain one", "plain two"]

    # max_length discards the oversized frame, keeps the rest
    [r3] = payload.select(
        octet_frames(F.col("p"), max_length=12).alias("f")
    ).collect()
    assert r3["f"] == ["hello world", "x"]

    # multi-byte chars: length is octets, not chars
    [r4] = spark.createDataFrame([("héllo",)], "m string").select(
        octet_frames(octet_encode(F.col("m"))).alias("f")
    ).collect()
    assert r4["f"] == ["héllo"]


def test_length_delimited_framing(spark):
    from vector_spark.sources.readers import (
        length_delimited_encode,
        length_delimited_frames,
    )

    msgs = ["alpha", "beta with spaces", ""]
    df = spark.createDataFrame([(m.encode(),) for m in msgs], "msg binary")
    payload = df.agg(
        F.aggregate(
            F.collect_list(length_delimited_encode(F.col("msg"))),
            F.lit(b""),
            lambda acc, x: F.concat(acc, x),
        ).alias("p")
    )
    [row] = payload.select(
        length_delimited_frames(F.col("p")).alias("f")
    ).collect()
    assert [bytes(b).decode() for b in row["f"]] == msgs


def test_gelf_chunk_reassembly(spark):
    from vector_spark.sources.readers import GELF_MAGIC, reassemble_gelf_chunks

    def chunk(msg_id: bytes, seq: int, total: int, body: bytes) -> bytes:
        return GELF_MAGIC + msg_id + bytes([seq, total]) + body

    rows = [
        (chunk(b"AAAAAAAA", 1, 2, b"-world"),),   # out of order
        (chunk(b"AAAAAAAA", 0, 2, b"hello"),),
        (b'{"short":"unchunked"}',),               # passes through
        (chunk(b"BBBBBBBB", 0, 3, b"in"),),        # incomplete: dropped
    ]
    df = spark.createDataFrame(rows, "payload binary")
    got = sorted(
        bytes(r["message"]).decode()
        for r in reassemble_gelf_chunks(df).collect()
    )
    assert got == sorted(['{"short":"unchunked"}', "hello-world"])


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


def test_avro_protobuf_clear_error_without_jar(spark):
    """The avro/protobuf codecs route to Spark's from_avro/
    from_protobuf; without the jar the call fails with actionable
    guidance (the jar-permitting contract, VERDICT r1 #7)."""
    from vector_spark.sources.readers import decode_avro, decode_protobuf

    with pytest.raises(RuntimeError, match="spark-avro"):
        decode_avro(
            spark, F.lit(b"").cast("binary"),
            '{"type":"record","name":"r","fields":[{"name":"x","type":"int"}]}',
        )
    with pytest.raises(RuntimeError, match="spark-protobuf"):
        decode_protobuf(spark, F.lit(b"").cast("binary"), "M", b"\x00")


def test_line_agg_continue_past(spark):
    # trailing-backslash continuation (line_agg.rs:33-37): a C-match
    # means the next line is part of the same message
    rows = [(1, "cmd one \\"), (2, "arg a \\"), (3, "arg b"), (4, "cmd two")]
    df = spark.createDataFrame(rows, "line_no int, value string")
    for fn in (line_agg, line_agg_exact):
        out = fn(
            df, start_pattern=r".", mode="continue_past",
            condition_pattern=r"\\$", order_by="line_no",
        ).orderBy("line_no").collect()
        assert [r["message"] for r in out] == [
            "cmd one \\\narg a \\\narg b",
            "cmd two",
        ], fn.__name__


def test_line_agg_halt_before(spark):
    # the legacy file-source default (line_agg.rs:39-42, for_legacy):
    # a line MATCHING the marker begins a new group; everything else
    # folds into the current one.  ADVICE round 1: the old impl split
    # a group after its first continuation line.
    rows = [
        (1, "=> msg one"),
        (2, "part a"),
        (3, "part b"),
        (4, "=> msg two"),
        (5, "tail"),
    ]
    df = spark.createDataFrame(rows, "line_no int, value string")
    for fn in (line_agg, line_agg_exact):
        out = fn(
            df, start_pattern=r"^=>", mode="halt_before", order_by="line_no"
        ).orderBy("line_no").collect()
        assert [r["message"] for r in out] == [
            "=> msg one\npart a\npart b",
            "=> msg two\ntail",
        ], fn.__name__


def test_line_agg_exact_matches_window_on_stack_traces(spark):
    # continue_through with complementary S/C patterns: both engines
    # must agree (the documented common case)
    rows = [
        (1, "ERROR boom"),
        (2, "  at frame1"),
        (3, "  at frame2"),
        (4, "INFO fine"),
        (5, "ERROR again"),
        (6, "  at frameX"),
    ]
    df = spark.createDataFrame(rows, "line_no int, value string")
    a = line_agg(
        df, start_pattern=r"^\S", mode="continue_through",
        condition_pattern=r"^\s", order_by="line_no",
    ).orderBy("line_no").collect()
    b = line_agg_exact(
        df, start_pattern=r"^\S", mode="continue_through",
        condition_pattern=r"^\s", order_by="line_no",
    ).orderBy("line_no").collect()
    assert [r["message"] for r in a] == [r["message"] for r in b] == [
        "ERROR boom\n  at frame1\n  at frame2",
        "INFO fine",
        "ERROR again\n  at frameX",
    ]


def test_line_agg_exact_vacant_state_edges(spark):
    # reference edges the window path can't express
    # (line_agg.rs:354-367): a vacant-state line NOT matching
    # start_pattern is emitted standalone; a halt_with start line that
    # itself matches C does not close its single-line buffer.
    rows = [(1, "  orphan"), (2, "ERROR x"), (3, "  at y")]
    df = spark.createDataFrame(rows, "line_no int, value string")
    out = line_agg_exact(
        df, start_pattern=r"^\S", mode="continue_through",
        condition_pattern=r"^\s", order_by="line_no",
    ).orderBy("line_no").collect()
    assert [r["message"] for r in out] == ["  orphan", "ERROR x\n  at y"]

    rows2 = [(1, "a;"), (2, "b;"), (3, "c")]
    df2 = spark.createDataFrame(rows2, "line_no int, value string")
    out2 = line_agg_exact(
        df2, start_pattern=r".", mode="halt_with",
        condition_pattern=r";$", order_by="line_no",
    ).orderBy("line_no").collect()
    # buffer [a;] → b; C-match EndInclude → [a;\nb;]; c buffers, drains
    assert [r["message"] for r in out2] == ["a;\nb;", "c"]


def test_line_agg_grouped_by_source_key(spark):
    # per-source-key isolation: records never span files
    rows = [
        ("f1", 1, "=> a"), ("f1", 2, "cont"),
        ("f2", 1, "=> b"), ("f2", 2, "more"),
    ]
    df = spark.createDataFrame(rows, "src string, line_no int, value string")
    for fn in (line_agg, line_agg_exact):
        out = fn(
            df, start_pattern=r"^=>", mode="halt_before",
            group_by=["src"], order_by="line_no",
        ).orderBy("src").collect()
        assert [(r["src"], r["message"]) for r in out] == [
            ("f1", "=> a\ncont"), ("f2", "=> b\nmore"),
        ], fn.__name__


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


def test_read_text_multiline_file_source(spark, tmp_path):
    """File source + multiline config (the reference's legacy marker
    mode): per-file assembly, records never span files."""
    from vector_spark.sources.readers import read_text_multiline

    (tmp_path / "a.log").write_text(
        "=> first msg\ncont a\ncont b\n=> second msg\ntail\n"
    )
    (tmp_path / "b.log").write_text("=> only msg\nmore\n")
    out = read_text_multiline(
        spark, str(tmp_path), r"^=>", mode="halt_before"
    ).collect()
    msgs = sorted(r["message"] for r in out)
    assert msgs == [
        "=> first msg\ncont a\ncont b",
        "=> only msg\nmore",
        "=> second msg\ntail",
    ]


def test_demo_logs_source(spark):
    """demo_logs synthetic source (demo_logs.rs): per-format streams
    decodable by their matching codec."""
    from vector_spark.functions.vrl import parse_syslog
    from vector_spark.sources.readers import demo_logs

    all_fmt = demo_logs(spark, 2000)
    assert all_fmt.count() == 2000
    assert all_fmt.columns == ["ts", "message"]

    js = demo_logs(spark, 2000, "json")
    decoded = js.withColumn(
        "d", F.from_json("message", "level string, msg string")
    )
    assert decoded.filter("d.level IS NULL").count() == 0

    # syslog = RFC 5424, bsd_syslog = RFC 3164 (demo_logs.rs:123-133)
    from vector_spark.functions.vrl import parse_syslog_5424

    sy = demo_logs(spark, 200, "syslog")
    ok = sy.withColumn("d", parse_syslog_5424(F.col("message")))
    assert ok.filter("d IS NULL").count() == 0
    bsd = demo_logs(spark, 200, "bsd_syslog")
    ok3164 = bsd.withColumn("d", parse_syslog(F.col("message")))
    assert ok3164.filter("d IS NULL").count() == 0

    ae = demo_logs(spark, 200, "apache_error")
    assert ae.filter(
        ~F.col("message").rlike(r"^\[\w{3} \w{3} \d{2}.*\] \[user\d+:\w+\] "
                                r"\[pid \d+:tid\] \[client [\d.]+:\d+\] ")
    ).count() == 0

    # deterministic across invocations
    a = sorted(r["message"] for r in demo_logs(spark, 100).collect())
    b = sorted(r["message"] for r in demo_logs(spark, 100).collect())
    assert a == b


def test_influxdb_line_protocol_codec(spark, tmp_path):
    lines = [
        "cpu,host=a,region=us usage=0.5,idle=99 1700000000000000000",
        "mem usage=1024",
    ]
    p = str(tmp_path / "influx.txt")
    with open(p, "w") as f:
        f.write("\n".join(lines))
    rows = {r["decoded"]["measurement"]: r["decoded"]
            for r in read_text_decoded(spark, p, "influxdb").collect()}
    cpu = rows["cpu"]
    assert cpu["tags"] == {"host": "a", "region": "us"}
    assert cpu["fields"] == {"usage": "0.5", "idle": "99"}
    assert cpu["ts_ns"] == 1700000000000000000
    mem = rows["mem"]
    assert mem["tags"] == {} and mem["fields"] == {"usage": "1024"}
    assert mem["ts_ns"] is None


def test_sink_compression_option(spark, tmp_path):
    from vector_spark.sources.readers import read_source
    from vector_spark.sources.sinks import write_sink

    t = transcripts_table(spark, 500)
    p1, p2 = str(tmp_path / "gz"), str(tmp_path / "plain")
    write_sink(t, p1, fmt="json", compression="gzip")
    write_sink(t, p2, fmt="json")
    import os as _os

    gz_files = [f for f in _os.listdir(p1) if f.endswith(".json.gz")]
    assert gz_files, "gzip json parts expected"
    assert read_source(spark, "json", p1).count() == 500  # transparently readable


def test_container_log_codecs(spark, tmp_path):
    """CRI (containerd) and docker json-file — the two Kubernetes
    container log formats."""
    cri = str(tmp_path / "cri.log")
    with open(cri, "w") as f:
        f.write("2026-08-17T10:00:00.123456789Z stdout F hello world\n"
                "2026-08-17T10:00:01.000000000Z stderr P partial chunk\n"
                "not a cri line\n")
    rows = read_text_decoded(spark, cri, "cri").collect()
    bymsg = {r["value"]: r["decoded"] for r in rows}
    ok = bymsg["2026-08-17T10:00:00.123456789Z stdout F hello world"]
    assert ok["message"] == "hello world" and ok["stream"] == "stdout"
    assert ok["partial"] is False and ok["timestamp"] is not None
    p = bymsg["2026-08-17T10:00:01.000000000Z stderr P partial chunk"]
    assert p["partial"] is True and p["stream"] == "stderr"
    assert bymsg["not a cri line"] is None

    dj = str(tmp_path / "docker.log")
    with open(dj, "w") as f:
        f.write('{"log": "line one\\n", "stream": "stdout", '
                '"time": "2026-08-17T10:00:00.5Z"}\n')
    d = read_text_decoded(spark, dj, "docker_json").first()["decoded"]
    assert d["message"] == "line one"  # trailing newline stripped
    assert d["stream"] == "stdout" and d["timestamp"] is not None


def test_reassemble_cri_partials(spark):
    import datetime as dt

    from vector_spark.sources.readers import _decode_cri, reassemble_cri

    lines = [
        ("f1", "stdout", 1, "2026-08-17T10:00:00Z stdout P chunk-a "),
        ("f1", "stdout", 2, "2026-08-17T10:00:01Z stdout P chunk-b "),
        ("f1", "stdout", 3, "2026-08-17T10:00:02Z stdout F chunk-c"),
        ("f1", "stdout", 4, "2026-08-17T10:00:03Z stdout F single"),
        ("f1", "stderr", 5, "2026-08-17T10:00:04Z stderr F other-stream"),
    ]
    df = spark.createDataFrame(
        lines, "src string, stream string, line_no int, value string"
    ).withColumn("decoded", _decode_cri(F.col("value"), None))
    out = reassemble_cri(df).orderBy("timestamp").collect()
    msgs = [(r["stream"], r["message"], r["n_chunks"]) for r in out]
    assert ("stdout", "chunk-a chunk-b chunk-c", 3) in msgs
    assert ("stdout", "single", 1) in msgs
    assert ("stderr", "other-stream", 1) in msgs
    assert len(msgs) == 3
    ts = {r["message"]: r["timestamp"] for r in out}
    assert ts["chunk-a chunk-b chunk-c"] == dt.datetime(2026, 8, 17, 10, 0, 0)


def test_read_container_logs_end_to_end(spark, tmp_path):
    (tmp_path / "pod1.log").write_text(
        "2026-08-17T10:00:00Z stdout P hello \n"
        "2026-08-17T10:00:01Z stdout F world\n"
        "2026-08-17T10:00:02Z stderr F oops\n"
    )
    from vector_spark.sources.readers import read_container_logs

    out = read_container_logs(spark, str(tmp_path)).collect()
    got = {(r["stream"], r["message"]) for r in out}
    assert got == {("stdout", "hello world"), ("stderr", "oops")}


def test_gelf_high_chunk_counts(spark):
    """seq/total are RAW BYTES up to 128 (GELF's max): 0x80 is invalid
    standalone UTF-8, so a binary→string decode mangles it to U+FFFD
    and silently drops the fully-received message.  Regression for the
    numeric byte decode."""
    from vector_spark.sources.readers import GELF_MAGIC, reassemble_gelf_chunks

    total = 128
    rows = [
        (GELF_MAGIC + b"CCCCCCCC" + bytes([seq, total]) + b"x",)
        for seq in range(total)
    ]
    df = spark.createDataFrame(rows, "payload binary")
    got = [
        bytes(r["message"]).decode()
        for r in reassemble_gelf_chunks(df).collect()
    ]
    assert got == ["x" * total]


def test_framing_discards_truncated_trailing_frame(spark):
    """A payload ending mid-frame (declared length > remaining bytes)
    must NOT emit the fragment as if it were complete — the reference
    framer holds incomplete frames and errors at EOF."""
    from vector_spark.sources.readers import (
        length_delimited_frames,
        octet_frames,
    )

    [r] = spark.createDataFrame(
        [("5 hello100 trunca",)], "p string"
    ).select(octet_frames(F.col("p")).alias("f")).collect()
    assert r["f"] == ["hello"]

    buf = (3).to_bytes(4, "big") + b"abc" + (100).to_bytes(4, "big") + b"def"
    [r2] = spark.createDataFrame([(buf,)], "p binary").select(
        length_delimited_frames(F.col("p")).alias("f")
    ).collect()
    assert [bytes(b) for b in r2["f"]] == [b"abc"]
