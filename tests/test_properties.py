"""Property-based tests (hypothesis) — the engine-side analogue of the
reference's quickcheck/Arbitrary coverage
(/root/reference/lib/vector-core/src/event/arbitrary_impl.rs): random
inputs, invariant assertions.  Example counts are kept small because
each example runs a (local) Spark job."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# lines that are either "starts" (no leading space) or continuations
_line = st.one_of(
    st.from_regex(r"[A-Za-z][A-Za-z0-9 ]{0,10}", fullmatch=True),
    st.from_regex(r"[ \t][A-Za-z0-9 ]{1,10}", fullmatch=True),
)


@SET
@given(lines=st.lists(_line, min_size=1, max_size=20))
def test_line_agg_vectorized_matches_exact_on_complementary_patterns(
    spark, lines
):
    """With complementary S/C patterns (the documented common config)
    the pure-window path and the reference state machine must agree on
    every possible line stream."""
    from vector_spark.sources.readers import line_agg, line_agg_exact

    df = spark.createDataFrame(
        list(enumerate(lines)), "line_no int, value string"
    )
    a = line_agg(
        df, start_pattern=r"^\S", mode="continue_through",
        condition_pattern=r"^\s", order_by="line_no",
    ).orderBy("line_no").collect()
    b = line_agg_exact(
        df, start_pattern=r"^\S", mode="continue_through",
        condition_pattern=r"^\s", order_by="line_no",
    ).orderBy("line_no").collect()
    # divergence is allowed ONLY for leading continuation lines (vacant
    # state) — generate streams starting with a start line to compare
    # exactly
    if not lines[0][0].isspace():
        assert [r["message"] for r in a] == [r["message"] for r in b]
    # both must cover every line exactly once, in order
    for rows in (a, b):
        assert "\n".join(r["message"] for r in rows) == "\n".join(lines)


_marked = st.one_of(
    st.from_regex(r"=>[a-z]{1,6}", fullmatch=True),   # marker line
    st.from_regex(r"[a-z]{1,8}", fullmatch=True),     # plain line
)


@SET
@given(lines=st.lists(_marked, min_size=1, max_size=20))
def test_line_agg_halt_before_and_continue_past_parity(spark, lines):
    """halt_before (legacy marker mode, S==C) and continue_past agree
    between the window path and the exact state machine whenever the
    stream opens with a start-pattern match (the vacant-state edge is
    the documented divergence)."""
    from vector_spark.sources.readers import line_agg, line_agg_exact

    df = spark.createDataFrame(
        list(enumerate(lines)), "line_no int, value string"
    )
    if lines[0].startswith("=>"):
        a = line_agg(df, r"^=>", mode="halt_before",
                     order_by="line_no").orderBy("line_no").collect()
        b = line_agg_exact(df, r"^=>", mode="halt_before",
                           order_by="line_no").orderBy("line_no").collect()
        assert [r["message"] for r in a] == [r["message"] for r in b]
    # continue_past and halt_with: S matches everything, so the
    # window path must match the exact state machine on ALL inputs —
    # including the first-line exemption (a buffer's first line is
    # never evaluated against C), via the alternating-run construction
    for mode in ("continue_past", "halt_with"):
        a2 = line_agg(df, start_pattern=r".", mode=mode,
                      condition_pattern=r"^=>",
                      order_by="line_no").orderBy("line_no").collect()
        b2 = line_agg_exact(df, start_pattern=r".", mode=mode,
                            condition_pattern=r"^=>",
                            order_by="line_no").orderBy("line_no").collect()
        assert [r["message"] for r in a2] == [r["message"] for r in b2], mode
        # coverage invariant: each line appears exactly once, in order
        assert "\n".join(r["message"] for r in a2) == "\n".join(lines)


@SET
@given(
    gaps=st.lists(st.integers(min_value=1, max_value=2000),
                  min_size=1, max_size=30)
)
def test_sessionize_counts_gap_crossings(spark, gaps):
    """n_sessions == 1 + number of inter-event gaps exceeding the
    threshold, for any gap sequence."""
    from pyspark.sql import functions as F

    from vector_spark.operators.reduce import sessionize

    t0 = dt.datetime(2026, 1, 1)
    ts, acc = [], 0
    for g in gaps:
        acc += g
        ts.append(t0 + dt.timedelta(seconds=acc))
    df = spark.createDataFrame(
        [("c", i, t) for i, t in enumerate(ts)],
        "conv_id string, turn_idx int, ts timestamp",
    )
    out = sessionize(df, ["conv_id"], gap_sec=600,
                     tiebreak_cols=["turn_idx"])
    n = out.agg(F.max("session_id")).first()[0] + 1
    expected = 1 + sum(1 for g in gaps[1:] if g > 600)
    assert n == expected


@SET
@given(
    vals=st.lists(
        st.floats(min_value=0.001, max_value=1e6,
                  allow_nan=False, allow_infinity=False),
        min_size=20, max_size=200,
    ),
    q=st.sampled_from([0.5, 0.9, 0.99]),
)
def test_ddsketch_quantile_alpha_bound(spark, vals, q):
    """The DDSketch estimate is within alpha (plus rank discretization)
    of a true element's value — the sketch's defining guarantee."""
    from pyspark.sql import functions as F

    from vector_spark.operators.sketch import ddsketch, ddsketch_quantile

    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    sk = ddsketch(df, ["g"], "v", alpha=0.01)
    est = sk.select(
        ddsketch_quantile(F.col("sketch"), F.col("n_zero"), F.col("total"),
                          q, alpha=0.01)
    ).first()[0]
    s = sorted(vals)
    rank = max(1, -(-q * len(s) // 1))  # ceil(q*n)
    exact = s[int(rank) - 1]
    assert abs(est - exact) / exact <= 0.011  # alpha + rounding slack


@SET
@given(
    n=st.integers(min_value=1, max_value=40),
    threshold=st.integers(min_value=1, max_value=10),
)
def test_throttle_never_exceeds_threshold(spark, n, threshold):
    from vector_spark.operators.throttle import throttle

    t0 = dt.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [("k", i, t0 + dt.timedelta(seconds=i)) for i in range(n)],
        "key string, i int, ts timestamp",
    )
    out = throttle(df, threshold=threshold, window_sec=3600,
                   key_fields=["key"], order_by=["ts", "i"])
    assert out.count() == min(n, threshold)


def test_round2_operators_invariant_under_repartition(spark):
    """Determinism guard: operator results must not depend on physical
    partitioning (the per-turn-equality discipline applied to the
    round-2 operators)."""
    import pyspark.sql.functions as SF

    from vector_spark.data.transcripts import transcripts_table
    from vector_spark.operators.reduce import reduce_segments
    from vector_spark.operators.sketch import ddsketch, ddsketch_quantile

    base = transcripts_table(spark, 6000)
    variants = [base, base.repartition(3), base.repartition(17, "role"),
                base.repartitionByRange(5, "ts")]

    def seg_fingerprint(df):
        out = reduce_segments(
            df, ["conv_id"], ord_col="turn_idx",
            ends_when=SF.col("text").startswith('{"'),
        )
        return sorted(
            (r["conv_id"], r["turn_idx"], r["_segment"])
            for r in out.collect()
        )

    def sketch_fingerprint(df):
        sk = ddsketch(
            df.select("role", SF.length("text").cast("double").alias("v")),
            ["role"], "v",
        )
        rows = sk.select(
            "role",
            ddsketch_quantile(SF.col("sketch"), SF.col("n_zero"),
                              SF.col("total"), 0.95).alias("p95"),
            "total",
        ).collect()
        return sorted((r["role"], r["p95"], r["total"]) for r in rows)

    segs = [seg_fingerprint(v) for v in variants]
    assert all(s == segs[0] for s in segs[1:])
    sks = [sketch_fingerprint(v) for v in variants]
    assert all(s == sks[0] for s in sks[1:])


# any unicode text (no surrogates), including digits-first lines,
# embedded newlines, and empty strings — octet counting must survive all
_frame_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
)


@SET
@given(msgs=st.lists(_frame_text, min_size=1, max_size=12))
def test_octet_framing_roundtrip_any_text(spark, msgs):
    """encode → concat → decode is the identity for ANY message list:
    octet counts alone delimit frames, so digit prefixes, newlines, and
    empty messages inside frames must all survive."""
    from pyspark.sql import functions as F

    from vector_spark.sources.readers import octet_encode, octet_frames

    df = spark.createDataFrame(
        list(enumerate(msgs)), "i int, msg string"
    )
    [row] = df.agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("i", octet_encode(F.col("msg")).alias("f")))
                ),
                lambda x: x["f"],
            ),
        ).alias("p")
    ).select(octet_frames(F.col("p")).alias("frames")).collect()
    assert row["frames"] == msgs


@SET
@given(msgs=st.lists(st.binary(max_size=40), min_size=1, max_size=12))
def test_length_delimited_roundtrip_any_bytes(spark, msgs):
    from pyspark.sql import functions as F

    from vector_spark.sources.readers import (
        length_delimited_encode,
        length_delimited_frames,
    )

    df = spark.createDataFrame(list(enumerate(msgs)), "i int, msg binary")
    [row] = df.agg(
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("i", length_delimited_encode(F.col("msg")).alias("f"))
                    )
                ),
                lambda x: x["f"],
            ),
            F.lit(b""),
            lambda acc, x: F.concat(acc, x),
        ).alias("p")
    ).select(length_delimited_frames(F.col("p")).alias("frames")).collect()
    assert [bytes(b) for b in row["frames"]] == msgs


@SET
@given(msgs=st.lists(st.binary(max_size=40), min_size=1, max_size=12))
def test_varint_length_delimited_roundtrip_any_bytes(spark, msgs):
    from pyspark.sql import functions as F

    from vector_spark.sources.readers import (
        varint_length_delimited_encode,
        varint_length_delimited_frames,
    )

    df = spark.createDataFrame(list(enumerate(msgs)), "i int, msg binary")
    [row] = df.agg(
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "i",
                            varint_length_delimited_encode(
                                F.col("msg")
                            ).alias("f"),
                        )
                    )
                ),
                lambda x: x["f"],
            ),
            F.lit(b""),
            lambda acc, x: F.concat(acc, x),
        ).alias("p")
    ).select(
        varint_length_delimited_frames(F.col("p")).alias("frames")
    ).collect()
    assert [bytes(b) for b in row["frames"]] == msgs


@SET
@given(
    msgs=st.lists(
        st.text(
            alphabet=st.characters(blacklist_characters="\x1f",
                                   min_codepoint=32, max_codepoint=126),
            max_size=20,
        ),
        min_size=1, max_size=10,
    )
)
def test_character_delimited_roundtrip(spark, msgs):
    """join-with-delimiter → frames is the identity when no message
    contains the delimiter; interior empties are real frames, a single
    trailing delimiter adds no frame."""
    from pyspark.sql import functions as F

    from vector_spark.sources.readers import character_delimited_frames

    payload = "\x1f".join(msgs)
    # an unterminated trailing empty message is indistinguishable from
    # end-of-buffer (decode_eof emits remaining bytes only if any);
    # with a trailing delimiter every message is terminated
    unterminated = msgs[:-1] if msgs[-1] == "" else msgs
    for p, expect in ((payload, unterminated), (payload + "\x1f", msgs)):
        [row] = (
            spark.range(1)
            .select(
                character_delimited_frames(
                    F.lit(p), "\x1f"
                ).alias("frames")
            ).collect()
        )
        assert row["frames"] == expect, (p, expect)


_apache_word = st.from_regex(r"[A-Za-z0-9_]{1,10}", fullmatch=True)


@SET
@given(
    ip=st.tuples(*[st.integers(0, 255)] * 4).map(lambda t: ".".join(map(str, t))),
    user=_apache_word,
    verb=st.sampled_from(["GET", "POST", "PUT", "DELETE", "HEAD"]),
    path=st.from_regex(r"/[A-Za-z0-9_./-]{0,20}", fullmatch=True),
    status=st.integers(100, 599),
    size=st.integers(0, 10**9),
    agent=st.from_regex(r"[A-Za-z0-9/. ()-]{1,25}", fullmatch=True),
)
def test_grok_combined_apache_roundtrip(ip, user, verb, path, status, size, agent):
    """COMBINEDAPACHELOG extracts every rendered field back, for any
    field values in the pattern's domain (pure-Python regex check — no
    Spark job per example)."""
    import re

    from vector_spark.functions.grok import grok_to_regex

    rx, fields = grok_to_regex("%{COMBINEDAPACHELOG}")
    line = (f'{ip} - {user} [17/Aug/2026:10:00:00 +0000] '
            f'"{verb} {path} HTTP/1.1" {status} {size} "-" "{agent}"')
    m = re.match(f"^{rx}$", line)
    assert m, line
    got = dict(zip(fields, m.groups()))
    assert got["clientip"] == ip and got["auth"] == user
    assert got["verb"] == verb and got["request"] == path
    assert got["response"] == str(status) and got["bytes"] == str(size)
    assert got["agent"] == f'"{agent}"'


_doc_text = st.text(
    alphabet=st.sampled_from(list("ab c\n")), min_size=0, max_size=60
)


@SET
@given(texts=st.lists(_doc_text, min_size=1, max_size=8))
def test_dedup_lines_global_idempotent_and_conserving(spark, texts):
    """Running corpus-global line dedup twice equals running it once,
    and the multiset of surviving lines is exactly the set of distinct
    input lines (nothing invented, nothing double-kept)."""
    from pyspark.sql import functions as F

    from vector_spark.datapipe.dedup import dedup_lines_global

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    once = dedup_lines_global(df)
    twice = dedup_lines_global(once)
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0

    kept_lines = [
        l
        for r in once.collect()
        if r["text"] != ""
        for l in r["text"].split("\n")
    ]
    distinct_input = {l for t in texts for l in t.split("\n")}
    # non-empty lines survive exactly once corpus-wide; empty lines
    # are formatting and are kept verbatim (idempotency: an emptied
    # doc's '' text must not steal blank lines on a second pass)
    nonempty = [l for l in kept_lines if l != ""]
    assert len(nonempty) == len(set(nonempty))
    assert set(kept_lines) <= distinct_input


@SET
@given(texts=st.lists(_doc_text, min_size=1, max_size=8))
def test_repetition_fractions_bounded(spark, texts):
    """Both repetition fractions live in [0, 1] for any input."""
    from vector_spark.datapipe.text import repetition_metrics

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    for r in repetition_metrics(df, top_n=2, dup_n=3).collect():
        assert 0.0 <= r["top2gram_char_frac"] <= 1.0
        assert 0.0 <= r["dup3gram_char_frac"] <= 1.0


def test_decontaminate_self_flags_all_long_docs(spark):
    """Decontaminating a corpus against itself flags exactly the docs
    that have at least one 13-gram (≥ 13 words)."""
    from pyspark.sql import functions as F

    from vector_spark.datapipe.dedup import decontaminate
    from vector_spark.datapipe.text import token_count

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    flagged = decontaminate(docs, docs, n=13).select("doc_id")
    long_docs = docs.filter(token_count(F.col("text")) >= 13).select("doc_id")
    assert flagged.exceptAll(long_docs).count() == 0
    assert long_docs.exceptAll(flagged).count() == 0


# ruby-hash values: strings may contain the very tokens the rewriter
# targets ('=>', ':sym =>', 'nil', quotes), plus ints/floats/nil
_ruby_str = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="\0\r\n",
    ),
    max_size=24,
)
_ruby_val = st.one_of(
    _ruby_str, st.integers(-10**6, 10**6), st.none(),
)
_ruby_key = st.from_regex(r"[a-z_][a-z0-9_]{0,8}", fullmatch=True)


def _render_ruby(d: dict, symbol_keys: bool) -> str:
    import json as _json

    parts = []
    for k, v in d.items():
        key = f":{k}" if symbol_keys else _json.dumps(k)
        if v is None:
            val = "nil"
        elif isinstance(v, str):
            val = _json.dumps(v)
        else:
            val = str(v)
        parts.append(f"{key} => {val}")
    return "{ " + ", ".join(parts) + " }"


@settings(max_examples=200, deadline=None)
@given(
    d=st.dictionaries(_ruby_key, _ruby_val, min_size=1, max_size=6),
    symbol_keys=st.booleans(),
)
def test_ruby_hash_rewriter_roundtrip(d, symbol_keys):
    """The string-aware rewriter (pure function, no Spark) must produce
    JSON that parses back to the original dict for ANY value content —
    including values containing '=>', ':sym =>', quotes, or 'nil',
    which the old context-free regex rewrite corrupted."""
    import json as _json

    from vector_spark.functions.vrl import _ruby_hash_to_json

    rendered = _render_ruby(d, symbol_keys)
    assert _json.loads(_ruby_hash_to_json(rendered)) == d


# datadog-search fuzz: arbitrary token soup must either compile to a
# Column or raise ValueError — never an unhandled exception type
_dd_chars = st.sampled_from(list("abz9:*()\"'<>=[]- _@.\\ANDORT"))


@settings(max_examples=300, deadline=None)
@given(q=st.text(alphabet=_dd_chars, min_size=1, max_size=40))
def test_datadog_search_fuzz_never_crashes(q):
    from pyspark.sql import Column

    from vector_spark.conditions_datadog import datadog_search

    try:
        c = datadog_search(q, tags_cols=("ddtags",))
    except ValueError:
        return
    assert isinstance(c, Column)


# --- codec round-trips (pure Python, no Spark -> high example counts)

_CODEC_SET = settings(max_examples=200, deadline=None)

_AVRO_PROP_SCHEMA = {
    "type": "record", "name": "P",
    "fields": [
        {"name": "s", "type": "string"},
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "bytes"},
        {"name": "o", "type": ["null", "string"]},
        {"name": "a", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
    ],
}

_avro_record = st.fixed_dictionaries({
    "s": st.text(max_size=40),
    "i": st.integers(-(2**31), 2**31 - 1),
    "l": st.integers(-(2**63), 2**63 - 1),
    "d": st.floats(allow_nan=False, allow_infinity=False),
    "b": st.binary(max_size=20),
    "o": st.none() | st.text(max_size=10),
    "a": st.lists(st.integers(-(2**63), 2**63 - 1), max_size=8),
    "m": st.dictionaries(st.text(max_size=8), st.text(max_size=8),
                         max_size=5),
})


@_CODEC_SET
@given(recs=st.lists(_avro_record, min_size=1, max_size=20),
       codec=st.sampled_from(["null", "deflate"]),
       block=st.integers(1, 7))
def test_avro_container_roundtrip_property(recs, codec, block):
    import json as _json

    from vector_spark.sources.avro import read_container, write_container

    blob = write_container(_json.dumps(_AVRO_PROP_SCHEMA), recs,
                           codec=codec, block_records=block)
    _, out = read_container(blob)
    assert out == recs


_PB_PROP_PROTO = """
syntax = "proto3";
message P {
  string s = 1;
  int64 l = 2;
  sint64 z = 3;
  repeated int64 a = 4;
  map<string, string> m = 5;
  double d = 6;
  bool ok = 7;
  bytes b = 8;
}
"""


@_CODEC_SET
@given(v=st.fixed_dictionaries({
    "s": st.text(min_size=1, max_size=30),
    "l": st.integers(-(2**63), 2**63 - 1),
    "z": st.integers(-(2**63), 2**63 - 1),
    "a": st.lists(st.integers(-(2**63), 2**63 - 1), max_size=8),
    "m": st.dictionaries(st.text(min_size=1, max_size=6),
                         st.text(max_size=6), max_size=4),
    "d": st.floats(allow_nan=False, allow_infinity=False),
    "ok": st.booleans(),
}))
def test_protobuf_roundtrip_property(v):
    import base64 as _b64

    from vector_spark.sources.protobuf import (
        decode_message, encode_message, parse_proto_text,
    )

    reg = parse_proto_text(_PB_PROP_PROTO)
    v = dict(v)
    v["b"] = _b64.b64encode(v["s"].encode()).decode()
    blob = encode_message(v, reg, "P")
    out = decode_message(blob, reg, "P")
    # scalar defaults are presence-explicit in this codec (written and
    # read back — the Spark seam's NULL-vs-0 distinction depends on
    # it); empty repeated/map have no wire representation and decode
    # as absent
    want = {k: x for k, x in v.items()
            if not (isinstance(x, (list, dict)) and len(x) == 0)}
    assert out == want


_cbor_value = st.recursive(
    st.none() | st.booleans()
    | st.integers(-(2**60), 2**60)
    | st.floats(allow_nan=False, allow_infinity=False)
    | st.text(max_size=20),
    lambda children: st.lists(children, max_size=5)
    | st.dictionaries(st.text(max_size=8), children, max_size=5),
    max_leaves=20,
)


@_CODEC_SET
@given(v=_cbor_value)
def test_cbor_roundtrip_property(v):
    from vector_spark.functions.cbor import decode_cbor_py, encode_cbor_py

    assert decode_cbor_py(encode_cbor_py(v)) == v


@SET
@given(msg=st.binary(min_size=1, max_size=400))
def test_gelf_chunk_reassemble_roundtrip(spark, msg):
    """gelf_chunk → reassemble_gelf_chunks is the identity for any
    payload (encoding/chunking/gelf.rs ↔ framing/chunked_gelf.rs):
    header layout, sequence order, and final-chunk truncation must all
    cancel."""
    from pyspark.sql import functions as F

    from vector_spark.sources.readers import (
        gelf_chunk,
        reassemble_gelf_chunks,
    )

    chunks = (
        spark.createDataFrame([(msg,)], "m binary")
        .select(F.explode(gelf_chunk(F.col("m"), 13 + 32)).alias("payload"))
    )
    [row] = reassemble_gelf_chunks(chunks).collect()
    assert bytes(row["message"]) == msg
