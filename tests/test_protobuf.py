"""Protobuf codec tests — wire conformance via independently
hand-built bytes, .proto text parsing, the self-hosted
FileDescriptorSet path (the reference's desc_file contract), and the
Spark seam."""

import base64
import struct

import pytest
from pyspark.sql import functions as F

from vector_spark.sources.protobuf import (
    ProtoSchemaError,
    decode_message,
    decode_protobuf_py,
    encode_descriptor_set,
    encode_message,
    encode_protobuf_py,
    from_protobuf_py,
    parse_descriptor_set,
    parse_proto_text,
    proto_spark_ddl,
)

PROTO = """
syntax = "proto3";
package demo;

message Turn {
  string conv_id = 1;
  int32 turn_idx = 2;
  sint64 delta = 3;
  repeated int64 flags = 4;
  map<string, string> attrs = 5;
  Kind kind = 6;
  Nested nested = 7;
  repeated Nested children = 8;
  bytes blob = 9;
  fixed32 f32 = 10;
  sfixed64 sf64 = 11;
  double score = 12;
  bool ok = 13 [deprecated = true];
  oneof body { string text = 14; uint64 code = 15; }

  message Nested { string s = 1; float x = 2; }
  enum Kind { USER = 0; ASSISTANT = 1; TOOL = 2; }
}
"""


def _vv(v):  # independent unsigned varint writer
    out = b""
    while True:
        if v < 0x80:
            return out + bytes([v])
        out += bytes([(v & 0x7F) | 0x80])
        v >>= 7


def _tag(fno, wt):
    return _vv((fno << 3) | wt)


@pytest.fixture(scope="module")
def reg():
    return parse_proto_text(PROTO)


def test_hand_built_wire_decodes(reg):
    nested = _tag(1, 2) + _vv(2) + b"hi" + _tag(2, 5) + struct.pack("<f", 1.5)
    attrs_entry = _tag(1, 2) + _vv(1) + b"k" + _tag(2, 2) + _vv(2) + b"vv"
    payload = (
        _tag(1, 2) + _vv(3) + b"c-1"                 # conv_id
        + _tag(2, 0) + _vv(7)                        # turn_idx
        + _tag(3, 0) + _vv(9)                        # delta: zigzag(9) = -5
        + _tag(4, 2) + _vv(3) + _vv(1) + _vv(2) + _vv(3)  # packed flags
        + _tag(5, 2) + _vv(len(attrs_entry)) + attrs_entry
        + _tag(6, 0) + _vv(2)                        # kind: TOOL
        + _tag(7, 2) + _vv(len(nested)) + nested
        + _tag(9, 2) + _vv(2) + b"\x00\xff"          # blob
        + _tag(10, 5) + (4000000000).to_bytes(4, "little")
        + _tag(11, 1) + ((-3) & ((1 << 64) - 1)).to_bytes(8, "little")
        + _tag(12, 1) + struct.pack("<d", 0.25)
        + _tag(13, 0) + _vv(1)
        + _tag(14, 2) + _vv(4) + b"text"
        + _tag(99, 0) + _vv(5)                       # unknown field: skipped
    )
    v = decode_message(payload, reg, "demo.Turn")
    assert v == {
        "conv_id": "c-1", "turn_idx": 7, "delta": -5,
        "flags": [1, 2, 3], "attrs": {"k": "vv"}, "kind": "TOOL",
        "nested": {"s": "hi", "x": 1.5},
        "blob": base64.b64encode(b"\x00\xff").decode(),
        "f32": 4000000000, "sf64": -3, "score": 0.25, "ok": True,
        "text": "text",
    }


def test_encode_roundtrip_all_types(reg):
    v = {
        "conv_id": "x", "turn_idx": -2, "delta": -(10**12),
        "flags": [0, -1, 2**40], "attrs": {"a": "1", "b": "2"},
        "kind": "ASSISTANT", "nested": {"s": "n", "x": 2.0},
        "children": [{"s": "c1", "x": 0.5}, {"s": "c2", "x": -0.5}],
        "blob": base64.b64encode(b"abc").decode(),
        "f32": 1, "sf64": -(2**40), "score": -1.5, "ok": False,
        "code": 2**63 + 11,
    }
    blob = encode_message(v, reg, "demo.Turn")
    assert decode_message(blob, reg, "demo.Turn") == v


def test_unpacked_repeated_also_accepted(reg):
    payload = (_tag(4, 0) + _vv(5)) + (_tag(4, 0) + _vv(6))
    assert decode_message(payload, reg, "demo.Turn") == {"flags": [5, 6]}


def test_wire_type_mismatch_raises(reg):
    bad = _tag(2, 2) + _vv(1) + b"x"  # turn_idx declared int32, sent LEN
    with pytest.raises(ValueError, match="wire type"):
        decode_message(bad, reg, "demo.Turn")


def test_message_field_sent_as_varint_raises_not_crashes(reg):
    """Round-5 advice (medium): a message-numbered field arriving as
    VARINT used to recurse into decode_message(int) and blow up with
    TypeError, killing the executor task instead of following the
    NULL-on-invalid convention.  Must raise ValueError (wire type)."""
    bad_msg = _tag(7, 0) + _vv(3)  # nested declared message, sent VARINT
    with pytest.raises(ValueError, match="wire type"):
        decode_message(bad_msg, reg, "demo.Turn")
    bad_map = _tag(5, 0) + _vv(3)  # attrs declared map, sent VARINT
    with pytest.raises(ValueError, match="wire type"):
        decode_message(bad_map, reg, "demo.Turn")


def test_message_field_varint_null_channel(spark, reg):
    """Same payload through the Spark UDF: NULL, not a task failure."""
    bad = _tag(7, 0) + _vv(3)
    df = spark.createDataFrame([(bytearray(bad),)], "pb binary")
    out = df.select(decode_protobuf_py(F.col("pb"), reg, "demo.Turn")
                    .alias("j")).collect()
    assert out[0]["j"] is None


def test_descriptor_set_self_hosted_roundtrip(reg):
    # registry -> binary FileDescriptorSet (our encoder) -> registry
    # (our own generic decoder parsing descriptor.proto) -> same decode
    blob_set = encode_descriptor_set(reg, package="demo")
    reg2 = parse_descriptor_set(blob_set)
    # flattened names: demo.Turn_Nested etc.; the root message survives
    assert "demo.Turn" in reg2["messages"]
    v = {"conv_id": "c", "turn_idx": 3, "flags": [7],
         "attrs": {"z": "9"}, "kind": "USER",
         "nested": {"s": "q", "x": 4.0}}
    wire = encode_message(v, reg, "demo.Turn")
    assert decode_message(wire, reg2, "demo.Turn") == v


def test_ddl_mapping(reg):
    ddl = proto_spark_ddl(reg, "demo.Turn")
    assert "conv_id string" in ddl
    assert "turn_idx int" in ddl
    assert "delta bigint" in ddl
    assert "flags array<bigint>" in ddl
    assert "attrs map<string,string>" in ddl
    assert "kind string" in ddl
    assert "nested struct<s:string, x:float>" in ddl
    assert "code decimal(20,0)" in ddl


def test_spark_roundtrip_and_error_channel(spark, reg):
    df = spark.range(40).select(
        F.concat(F.lit("c"), F.col("id")).alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        (F.col("id") * -3).alias("delta"),
    )
    enc = df.select(
        "conv_id", "turn_idx", "delta",
        encode_protobuf_py(
            reg, "demo.Turn",
            F.col("conv_id"), F.col("turn_idx"), F.col("delta"),
        ).alias("pb"),
    )
    dec = enc.select(
        "conv_id", "turn_idx", "delta",
        from_protobuf_py(F.col("pb"), reg, "demo.Turn").alias("r"),
    )
    bad = dec.where(
        ~(F.col("r.conv_id").eqNullSafe(F.col("conv_id"))
          & F.col("r.turn_idx").eqNullSafe(F.col("turn_idx"))
          & F.col("r.delta").eqNullSafe(F.col("delta")))
    ).count()
    assert bad == 0
    # malformed payloads -> NULL (error channel), not a job failure
    garbled = enc.select(
        decode_protobuf_py(
            F.concat(F.lit(b"\x15\x01"), F.col("pb")), reg, "demo.Turn"
        ).alias("j")
    )
    assert garbled.where(F.col("j").isNotNull()).count() == 0


def test_unknown_message_type_raises(reg):
    with pytest.raises(ProtoSchemaError, match="unknown message"):
        decode_message(b"", reg, "demo.Missing")


def test_config_accepts_protobuf_source(spark, tmp_path, reg):
    from vector_spark.config import build_topology

    # both descriptor surfaces: a .proto source and a compiled
    # FileDescriptorSet (built with our own encoder)
    proto_path = tmp_path / "turn.proto"
    proto_path.write_text(PROTO)
    desc_path = tmp_path / "turn.desc"
    desc_path.write_bytes(encode_descriptor_set(reg, package="demo"))
    d = tmp_path / "pb_src"
    d.mkdir()
    (d / "m1.pb").write_bytes(encode_message(
        {"conv_id": "c1", "turn_idx": 1}, reg, "demo.Turn"))
    (d / "m2.pb").write_bytes(encode_message(
        {"conv_id": "c2", "turn_idx": 2}, reg, "demo.Turn"))
    for src_cfg in (
        {"type": "protobuf", "path": str(d), "proto_file": str(proto_path),
         "message_type": "demo.Turn"},
        {"type": "protobuf", "path": str(d), "desc_file": str(desc_path),
         "message_type": "demo.Turn"},
    ):
        out = build_topology(spark, {"sources": {"pb": src_cfg}})
        rows = {(r["conv_id"], r["turn_idx"]) for r in out["pb"].collect()}
        assert rows == {("c1", 1), ("c2", 2)}
