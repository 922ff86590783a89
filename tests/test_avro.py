"""Avro codec tests — spec conformance via independently hand-built
byte sequences (not just encoder/decoder mirrors), container files with
both codecs, Confluent prefix handling, and the Spark seam."""

import json
import struct
import zlib

import pytest
from pyspark.sql import functions as F

from vector_spark.sources.avro import (
    write_avro,
    AvroSchemaError,
    avro_spark_ddl,
    decode_avro_py,
    decode_datum,
    encode_avro_py,
    encode_datum,
    from_avro_py,
    parse_schema,
    read_avro,
    read_container,
    write_container,
)

RECORD = json.dumps(
    {
        "type": "record",
        "name": "Turn",
        "fields": [
            {"name": "conv_id", "type": "string"},
            {"name": "turn_idx", "type": "int"},
            {"name": "role", "type": ["null", "string"]},
            {"name": "score", "type": "double"},
            {"name": "flags", "type": {"type": "array", "items": "long"}},
            {"name": "attrs", "type": {"type": "map", "values": "string"}},
            {
                "name": "kind",
                "type": {
                    "type": "enum",
                    "name": "Kind",
                    "symbols": ["user", "assistant", "tool"],
                },
            },
            {"name": "blob", "type": "bytes"},
        ],
    }
)


def _zz(v: int) -> bytes:
    """Independent zigzag varint writer (from the spec text, written
    separately from the module's)."""
    u = (v << 1) ^ (v >> 63) if v >= 0 else 2 * (-v) - 1
    out = b""
    while True:
        if u < 0x80:
            return out + bytes([u])
        out += bytes([(u & 0x7F) | 0x80])
        u >>= 7


def test_zigzag_varint_edges():
    sch = parse_schema('"long"')
    for v in (0, -1, 1, -2, 2, 63, -64, 64, 12345678901,
              -(2**63), 2**63 - 1):
        assert decode_datum(sch, _zz(v)) == v
        assert encode_datum(sch, v) == _zz(v)


def test_hand_built_record_decodes():
    # spec: fields concatenated in order, no tags
    payload = (
        _zz(4) + b"c-42"                       # conv_id: string
        + _zz(7)                               # turn_idx: int
        + _zz(1) + _zz(9) + b"assistant"       # role: union idx 1 + string
        + struct.pack("<d", 2.5)               # score: double
        + _zz(2) + _zz(10) + _zz(-3) + _zz(0)  # flags: [10, -3]
        + _zz(1) + _zz(1) + b"k" + _zz(2) + b"vv" + _zz(0)  # attrs {k: vv}
        + _zz(1)                               # kind: enum idx 1
        + _zz(3) + b"\x00\x01\xff"             # blob: bytes
    )
    v = decode_datum(parse_schema(RECORD), payload)
    assert v == {
        "conv_id": "c-42", "turn_idx": 7, "role": "assistant",
        "score": 2.5, "flags": [10, -3], "attrs": {"k": "vv"},
        "kind": "assistant", "blob": b"\x00\x01\xff",
    }
    # and our encoder produces the identical bytes
    assert encode_datum(parse_schema(RECORD), v) == payload


def test_negative_array_block_count_with_size():
    # spec: negative count = abs(count) items preceded by a byte size
    sch = parse_schema('{"type": "array", "items": "int"}')
    items = _zz(5) + _zz(6)
    payload = _zz(-2) + _zz(len(items)) + items + _zz(0)
    assert decode_datum(sch, payload) == [5, 6]


def test_union_null_orderings_and_trailing_reject():
    both = ['["null", "int"]', '["int", "null"]']
    for s in both:
        sch = parse_schema(s)
        null_idx = 0 if s.startswith('["null"') else 1
        assert decode_datum(sch, _zz(null_idx)) is None
        assert decode_datum(sch, _zz(1 - null_idx) + _zz(41)) == 41
    with pytest.raises(ValueError, match="trailing"):
        decode_datum(parse_schema('"int"'), _zz(1) + b"\x00")


def test_named_type_reference_and_recursive():
    sch = parse_schema(json.dumps({
        "type": "record", "name": "Node",
        "fields": [
            {"name": "v", "type": "int"},
            {"name": "next", "type": ["null", "Node"]},
        ],
    }))
    v = {"v": 1, "next": {"v": 2, "next": None}}
    assert decode_datum(sch, encode_datum(sch, v)) == v


def test_fixed_and_float():
    sch = parse_schema(json.dumps({
        "type": "record", "name": "R",
        "fields": [
            {"name": "f4", "type": {"type": "fixed", "name": "F4",
                                     "size": 4}},
            {"name": "x", "type": "float"},
            {"name": "b", "type": "boolean"},
        ],
    }))
    payload = b"abcd" + struct.pack("<f", 1.5) + b"\x01"
    assert decode_datum(sch, payload) == {
        "f4": b"abcd", "x": 1.5, "b": True
    }


def test_container_roundtrip_both_codecs_multiblock():
    recs = [
        {"conv_id": f"c{i}", "turn_idx": i, "role": None if i % 3 else "u",
         "score": i / 2, "flags": [i, -i], "attrs": {"i": str(i)},
         "kind": "user", "blob": bytes([i % 256])}
        for i in range(25)
    ]
    for codec in ("null", "deflate"):
        blob = write_container(RECORD, recs, codec=codec, block_records=7)
        schema, out = read_container(blob)
        assert out == recs
    # deflate body really is raw-deflate (no zlib header) per spec
    blob = write_container(RECORD, recs[:1], codec="deflate")
    assert zlib  # touch import


def test_container_sync_mismatch_raises():
    blob = bytearray(write_container(RECORD, [{
        "conv_id": "c", "turn_idx": 0, "role": None, "score": 0.0,
        "flags": [], "attrs": {}, "kind": "user", "blob": b""}]))
    blob[-1] ^= 0xFF  # corrupt trailing sync
    with pytest.raises(ValueError, match="sync"):
        read_container(bytes(blob))


def test_spark_ddl_mapping():
    ddl = avro_spark_ddl(RECORD)
    assert "conv_id string" in ddl
    assert "turn_idx int" in ddl
    assert "role string" in ddl
    assert "flags array<bigint>" in ddl
    assert "attrs map<string,string>" in ddl
    with pytest.raises(AvroSchemaError, match="union"):
        avro_spark_ddl('["int", "string", "null"]')


def test_spark_roundtrip_and_confluent_prefix(spark):
    sch = json.dumps({
        "type": "record", "name": "R",
        "fields": [
            {"name": "id", "type": "string"},
            {"name": "n", "type": "long"},
            {"name": "tag", "type": ["null", "string"]},
        ],
    })
    df = spark.range(50).select(
        F.concat(F.lit("id-"), F.col("id")).alias("id"),
        (F.col("id") * 3 - 7).alias("n"),
        F.when(F.col("id") % 2 == 0,
               F.concat(F.lit("t"), F.col("id"))).alias("tag"),
    )
    enc = df.select(
        "id", "n", "tag",
        encode_avro_py(sch, F.col("id"), F.col("n"), F.col("tag"))
        .alias("avro"),
    )
    dec = enc.select(
        "id", "n", "tag", from_avro_py(F.col("avro"), sch).alias("r")
    )
    bad = dec.where(
        ~(F.col("r.id").eqNullSafe(F.col("id"))
          & F.col("r.n").eqNullSafe(F.col("n"))
          & F.col("r.tag").eqNullSafe(F.col("tag")))
    ).count()
    assert bad == 0

    # Confluent framing: magic 0 + 4-byte schema id before the datum
    framed = enc.select(
        F.concat(F.lit(b"\x00\x00\x00\x00\x07"), F.col("avro"))
        .alias("framed"), F.col("n"))
    with_strip = framed.select(
        F.from_json(
            decode_avro_py(F.col("framed"), sch,
                           strip_schema_id_prefix=True),
            "id string, n bigint, tag string",
        ).alias("r"), F.col("n"))
    assert with_strip.where(F.col("r.n") != F.col("n")).count() == 0
    # without stripping the payload is invalid -> NULL (error channel)
    no_strip = framed.select(
        decode_avro_py(F.col("framed"), sch).alias("j"))
    assert no_strip.where(F.col("j").isNotNull()).count() == 0


def test_read_avro_file(spark, tmp_path):
    recs = [{"conv_id": f"c{i}", "turn_idx": i, "role": "user",
             "score": 0.5 * i, "flags": [i], "attrs": {},
             "kind": "tool", "blob": b"z"} for i in range(12)]
    p = tmp_path / "part-0.avro"
    p.write_bytes(write_container(RECORD, recs, codec="deflate",
                                  block_records=5))
    df = read_avro(spark, str(tmp_path / "*.avro"))
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["score"], r["flags"][0])
        for r in df.collect()
    )
    assert got == sorted((f"c{i}", i, 0.5 * i, i) for i in range(12))


def test_config_accepts_avro_source(spark, tmp_path):
    import json as _json

    from vector_spark.config import build_topology

    sch = _json.dumps({
        "type": "record", "name": "E",
        "fields": [{"name": "k", "type": "string"},
                   {"name": "v", "type": "long"}],
    })
    d = tmp_path / "avro_src"
    d.mkdir()
    (d / "a.avro").write_bytes(write_container(
        sch, [{"k": "x", "v": 1}, {"k": "y", "v": 2}]))
    out = build_topology(
        spark,
        {"sources": {"ev": {"type": "avro",
                            "path": str(d / "*.avro")}}},
    )
    rows = {(r["k"], r["v"]) for r in out["ev"].collect()}
    assert rows == {("x", 1), ("y", 2)}


def test_write_avro_roundtrip(spark, tmp_path):
    sch = json.dumps({
        "type": "record", "name": "E",
        "fields": [
            {"name": "k", "type": "string"},
            {"name": "v", "type": "long"},
            {"name": "x", "type": ["null", "double"]},
        ],
    })
    df = spark.range(200).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"),
        (F.col("id") * 7).alias("v"),
        F.when(F.col("id") % 3 == 0, F.col("id") / 2.0).alias("x"),
    ).repartition(4)
    out_dir = tmp_path / "avro_out"
    paths = write_avro(df, str(out_dir), sch, codec="deflate",
                       block_records=37)
    assert 1 <= len(paths) <= 4
    back = read_avro(spark, str(out_dir / "*.avro"))
    assert back.count() == 200
    joined = back.alias("b").join(
        df.alias("d"), "k").where(
        (F.col("b.v") != F.col("d.v"))
        | ~F.col("b.x").eqNullSafe(F.col("d.x"))
    )
    assert joined.count() == 0


def test_decimal_logical_type():
    sch = json.dumps({
        "type": "record", "name": "D",
        "fields": [
            {"name": "amt", "type": {"type": "bytes",
                                     "logicalType": "decimal",
                                     "precision": 10, "scale": 2}},
            {"name": "fx", "type": {"type": "fixed", "name": "F8",
                                    "size": 8,
                                    "logicalType": "decimal",
                                    "precision": 18, "scale": 4}},
        ],
    })
    parsed = parse_schema(sch)
    # hand-built: unscaled 12345 at scale 2 = "123.45"; two's
    # complement big-endian minimal bytes of 12345 = 0x3039
    payload = _zz(2) + bytes.fromhex("3039") + (-70000).to_bytes(
        8, "big", signed=True)
    v = decode_datum(parsed, payload)
    from vector_spark.sources.avro import _jsonable

    j = _jsonable(parsed["root"], parsed["names"], v)
    assert j == {"amt": "123.45", "fx": "-7.0000"}
    # encoder accepts decimal strings and reproduces the wire bytes
    assert encode_datum(parsed, {"amt": "123.45", "fx": "-7.0000"}) \
        == payload
    # negative bytes-decimal round trip
    blob = encode_datum(parsed, {"amt": "-0.03", "fx": "0.0001"})
    j2 = _jsonable(parsed["root"], parsed["names"],
                   decode_datum(parsed, blob))
    assert j2 == {"amt": "-0.03", "fx": "0.0001"}
    # DDL maps to exact decimal types
    ddl = avro_spark_ddl(sch)
    assert "amt decimal(10,2)" in ddl and "fx decimal(18,4)" in ddl


def test_decimal_spark_seam(spark):
    sch = json.dumps({
        "type": "record", "name": "D",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "amt", "type": {"type": "bytes",
                                     "logicalType": "decimal",
                                     "precision": 10, "scale": 2}},
        ],
    })
    df = spark.range(20).select(
        F.col("id"),
        (F.col("id") * 7 - 50).cast("decimal(10,2)").alias("amt"))
    enc = df.select(
        "id", "amt", encode_avro_py(sch, F.col("id"), F.col("amt"))
        .alias("a"))
    dec = enc.select("id", "amt",
                     from_avro_py(F.col("a"), sch).alias("r"))
    assert dec.where(~F.col("r.amt").eqNullSafe(F.col("amt"))).count() == 0


# --- schema resolution (spec: evolution) ---

V1 = json.dumps({
    "type": "record", "name": "T",
    "fields": [
        {"name": "id", "type": "int"},
        {"name": "old_name", "type": "string"},
        {"name": "dropped", "type": "string"},
        {"name": "score", "type": "int"},
    ],
})
V2_READER = json.dumps({
    "type": "record", "name": "T",
    "fields": [
        {"name": "id", "type": "long"},                      # promotion
        {"name": "name", "type": "string",
         "aliases": ["old_name"]},                            # rename
        {"name": "score", "type": "double"},                 # promotion
        {"name": "tag", "type": ["null", "string"],
         "default": None},                                    # new field
        {"name": "n", "type": "int", "default": 7},          # new field
    ],
})


def test_schema_resolution_evolution():
    from vector_spark.sources.avro import decode_datum_resolved

    w, r = parse_schema(V1), parse_schema(V2_READER)
    blob = encode_datum(w, {"id": 3, "old_name": "x",
                            "dropped": "gone", "score": 5})
    out = decode_datum_resolved(w, r, blob)
    assert out == {"id": 3, "name": "x", "score": 5.0,
                   "tag": None, "n": 7}
    assert isinstance(out["score"], float)


def test_schema_resolution_union_and_missing_default():
    from vector_spark.sources.avro import decode_datum_resolved

    w = parse_schema('["null", "int"]')
    r = parse_schema('["null", "long"]')
    assert decode_datum_resolved(w, r, encode_datum(w, 5)) == 5
    assert decode_datum_resolved(w, r, encode_datum(w, None)) is None
    # writer scalar into reader union
    w2 = parse_schema('"string"')
    r2 = parse_schema('["null", "bytes"]')  # string promotes to bytes
    assert decode_datum_resolved(w2, r2, encode_datum(w2, "ab")) == b"ab"
    # reader-only field without default -> loud error
    w3 = parse_schema(json.dumps({
        "type": "record", "name": "R",
        "fields": [{"name": "a", "type": "int"}]}))
    r3 = parse_schema(json.dumps({
        "type": "record", "name": "R",
        "fields": [{"name": "a", "type": "int"},
                   {"name": "b", "type": "int"}]}))
    with pytest.raises(AvroSchemaError, match="no default"):
        decode_datum_resolved(w3, r3, encode_datum(w3, {"a": 1}))


def test_schema_resolution_enum_default():
    from vector_spark.sources.avro import decode_datum_resolved

    w = parse_schema(json.dumps({
        "type": "enum", "name": "K",
        "symbols": ["A", "B", "NEW"]}))
    r = parse_schema(json.dumps({
        "type": "enum", "name": "K",
        "symbols": ["A", "B", "UNK"], "default": "UNK"}))
    assert decode_datum_resolved(w, r, encode_datum(w, "B")) == "B"
    assert decode_datum_resolved(w, r, encode_datum(w, "NEW")) == "UNK"


def test_read_avro_mixed_generations(spark, tmp_path):
    recs_v1 = [{"id": i, "old_name": f"n{i}", "dropped": "d",
                "score": i} for i in range(5)]
    v2_writer = json.dumps({
        "type": "record", "name": "T",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "score", "type": "double"},
            {"name": "tag", "type": ["null", "string"]},
            {"name": "n", "type": "int"},
        ],
    })
    recs_v2 = [{"id": 100 + i, "name": f"m{i}", "score": i / 2,
                "tag": "t", "n": i} for i in range(5)]
    d = tmp_path / "gen"
    d.mkdir()
    (d / "old.avro").write_bytes(write_container(V1, recs_v1))
    (d / "new.avro").write_bytes(write_container(v2_writer, recs_v2))
    df = read_avro(spark, str(d / "*.avro"), reader_schema=V2_READER)
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == 10
    assert rows[3]["name"] == "n3" and rows[3]["n"] == 7
    assert rows[3]["tag"] is None and rows[3]["score"] == 3.0
    assert rows[103]["name"] == "m3" and rows[103]["tag"] == "t"


def test_read_avro_explicit_schema_resolves_per_file(spark, tmp_path):
    """Round-5 advice: an explicit ``schema_json`` (no reader_schema)
    must act as the READER schema — per-file spec resolution against
    each container's writer schema — not render writer-shaped records
    through a mismatched shape (which silently dropped reordered /
    evolved fields to NULL)."""
    reader = json.dumps({
        "type": "record", "name": "T",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "extra", "type": "string", "default": "dflt"},
        ],
    })
    # writer: reordered fields + a field the reader drops, no `extra`
    writer = json.dumps({
        "type": "record", "name": "T",
        "fields": [
            {"name": "name", "type": "string"},
            {"name": "ignored", "type": "int"},
            {"name": "id", "type": "long"},
        ],
    })
    d = tmp_path / "x"
    d.mkdir()
    (d / "a.avro").write_bytes(write_container(
        writer, [{"name": f"n{i}", "ignored": i, "id": i}
                 for i in range(4)]))
    rows = {r["id"]: r
            for r in read_avro(spark, str(d / "*.avro"),
                               schema_json=reader).collect()}
    assert len(rows) == 4
    # reordered fields match by name, missing field takes its default
    assert rows[2]["name"] == "n2" and rows[2]["extra"] == "dflt"


def test_decimal_in_union_and_fixed_size_resolution():
    from vector_spark.sources.avro import decode_datum_resolved

    sch = parse_schema(json.dumps({
        "type": "record", "name": "U",
        "fields": [{"name": "amt", "type": ["null", {
            "type": "bytes", "logicalType": "decimal",
            "precision": 10, "scale": 2}]}],
    }))
    blob = encode_datum(sch, {"amt": "9.99"})
    from vector_spark.sources.avro import _jsonable

    v = decode_datum(sch, blob)
    assert _jsonable(sch["root"], sch["names"], v) == {"amt": "9.99"}
    assert _jsonable(
        sch["root"], sch["names"],
        decode_datum(sch, encode_datum(sch, {"amt": None}))
    ) == {"amt": None}
    # fixed resolution requires matching sizes
    w = parse_schema(json.dumps({"type": "fixed", "name": "F",
                                 "size": 4}))
    r_bad = parse_schema(json.dumps({"type": "fixed", "name": "F",
                                     "size": 8}))
    with pytest.raises(AvroSchemaError):
        decode_datum_resolved(w, r_bad, b"abcd")
    r_ok = parse_schema(json.dumps({"type": "fixed", "name": "F",
                                    "size": 4}))
    assert decode_datum_resolved(w, r_ok, b"abcd") == b"abcd"


def test_config_avro_sink_and_reader_schema(spark, tmp_path):
    from vector_spark.config import run_topology

    sch = json.dumps({
        "type": "record", "name": "E",
        "fields": [{"name": "k", "type": "string"},
                   {"name": "v", "type": "long"}],
    })
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.avro").write_bytes(write_container(
        sch, [{"k": f"k{i}", "v": i} for i in range(30)]))
    out_dir = tmp_path / "out"
    counts = run_topology(spark, {
        "sources": {"ev": {"type": "avro", "path": str(src / "*.avro"),
                           "reader_schema": sch}},
        "sinks": {"arch": {"type": "avro", "inputs": ["ev"],
                           "path": str(out_dir), "schema": sch}},
    })
    assert counts == {"arch": 30}
    back = read_avro(spark, str(out_dir))
    assert back.count() == 30
    assert {r["k"] for r in back.collect()} == {f"k{i}" for i in range(30)}
