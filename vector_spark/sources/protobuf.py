"""Protobuf codec — descriptor-driven pure-Python decoder/encoder,
jar-free.

The reference's protobuf codec takes a compiled FileDescriptorSet file
plus a fully-qualified message type and decodes payloads reflectively
(`lib/codecs/src/decoding/format/protobuf.rs:79-118` — `desc_file` /
`message_type` / `get_message_descriptor_from_bytes`;
`proto_to_value` maps decoded fields onto the event value model).
`readers.decode_protobuf` wraps Spark's `from_protobuf` for clusters
with the spark-protobuf jar; this module removes the jar dependency the
same way sources/otlp.py did for OTLP: the wire format is small and
public (https://protobuf.dev/programming-guides/encoding/), so decode
it directly against a descriptor.

Descriptors come from either surface the reference supports:

- `parse_descriptor_set(blob, message_type)` — the binary
  FileDescriptorSet itself IS a protobuf message with a public schema
  (descriptor.proto), so it is parsed **with this module's own generic
  decoder** against a built-in hand-written descriptor of
  descriptor.proto's subset — the exact `desc_file` contract, no
  protoc/google.protobuf import needed.
- `parse_proto_text(src)` — a direct `.proto` source parser
  (proto2/proto3 subset: message / nested message / enum / repeated /
  optional / oneof (flattened, wire-identical) / map<K,V> / package),
  for when the user has the schema but not a compiled descriptor.

Wire coverage: varint / zigzag sint / fixed32/64 (+signed) / float /
double / bool / string / bytes / enum / nested message / repeated
(packed and unpacked accepted on decode, packed numerics emitted on
encode per proto3) / map fields; unknown fields are skipped (proto
compatibility rule).  Scale: decode is an Arrow-batched pandas UDF
emitting JSON consumed by `from_json` with `proto_spark_ddl`, so the
hot path after the codec boundary is JVM-side.
"""

from __future__ import annotations

import base64
import json
import re
import struct

import pandas as pd
from pyspark.sql import Column, functions as F

from vector_spark.sources.otlp import (
    _I32,
    _I64,
    _LEN,
    _VARINT,
    _fields,
    _read_varint,
    _write_varint,
)

#: FieldDescriptorProto.Type numbers (descriptor.proto, public)
_T_DOUBLE, _T_FLOAT, _T_INT64, _T_UINT64, _T_INT32 = 1, 2, 3, 4, 5
_T_FIXED64, _T_FIXED32, _T_BOOL, _T_STRING, _T_GROUP = 6, 7, 8, 9, 10
_T_MESSAGE, _T_BYTES, _T_UINT32, _T_ENUM = 11, 12, 13, 14
_T_SFIXED32, _T_SFIXED64, _T_SINT32, _T_SINT64 = 15, 16, 17, 18

_SCALAR_NAMES = {
    "double": _T_DOUBLE, "float": _T_FLOAT, "int64": _T_INT64,
    "uint64": _T_UINT64, "int32": _T_INT32, "fixed64": _T_FIXED64,
    "fixed32": _T_FIXED32, "bool": _T_BOOL, "string": _T_STRING,
    "bytes": _T_BYTES, "uint32": _T_UINT32, "sfixed32": _T_SFIXED32,
    "sfixed64": _T_SFIXED64, "sint32": _T_SINT32, "sint64": _T_SINT64,
}

#: wire type each scalar uses when not packed
_WIRE_OF = {
    _T_DOUBLE: _I64, _T_FLOAT: _I32, _T_INT64: _VARINT, _T_UINT64: _VARINT,
    _T_INT32: _VARINT, _T_FIXED64: _I64, _T_FIXED32: _I32, _T_BOOL: _VARINT,
    _T_STRING: _LEN, _T_BYTES: _LEN, _T_UINT32: _VARINT, _T_ENUM: _VARINT,
    _T_SFIXED32: _I32, _T_SFIXED64: _I64, _T_SINT32: _VARINT,
    _T_SINT64: _VARINT,
}


class ProtoSchemaError(ValueError):
    pass


# ---------------------------------------------------------------------------
# descriptor model
#
# Registry = {"messages": {fq: {"name": fq, "fields": {num: Field}}},
#             "enums": {fq: {num: symbol}}}
# Field = {"name", "num", "type": int (_T_*), "repeated": bool,
#          "type_name": fq | None, "map": bool}


def _u2s64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _u2s32(v: int) -> int:
    return v - (1 << 32) if v >= (1 << 31) else v


def _unzig(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _zig(v: int) -> int:
    return (v << 1) if v >= 0 else (((-v - 1) << 1) | 1)


def _scalar_value(ftype: int, wt: int, v, registry, type_name):
    if ftype == _T_DOUBLE:
        return struct.unpack("<d", int(v).to_bytes(8, "little"))[0]
    if ftype == _T_FLOAT:
        return struct.unpack("<f", int(v).to_bytes(4, "little"))[0]
    if ftype in (_T_INT64, _T_INT32):
        return _u2s64(v)
    if ftype in (_T_UINT64, _T_UINT32):
        return v
    if ftype in (_T_SINT32, _T_SINT64):
        return _unzig(v)
    if ftype == _T_FIXED64:
        return v
    if ftype == _T_SFIXED64:
        return _u2s64(v)
    if ftype == _T_FIXED32:
        return v
    if ftype == _T_SFIXED32:
        return _u2s32(v)
    if ftype == _T_BOOL:
        return bool(v)
    if ftype == _T_STRING:
        return v.decode("utf-8", errors="replace")
    if ftype == _T_BYTES:
        return base64.b64encode(bytes(v)).decode("ascii")
    if ftype == _T_ENUM:
        syms = registry["enums"].get(type_name, {})
        return syms.get(v, str(v))
    raise ProtoSchemaError(f"unsupported scalar type {ftype}")


def _packed_values(ftype: int, payload: bytes, registry, type_name) -> list:
    out = []
    i, n = 0, len(payload)
    while i < n:
        wt = _WIRE_OF[ftype]
        if wt == _VARINT:
            raw, i = _read_varint(payload, i)
        elif wt == _I64:
            raw = int.from_bytes(payload[i : i + 8], "little")
            i += 8
        elif wt == _I32:
            raw = int.from_bytes(payload[i : i + 4], "little")
            i += 4
        else:
            raise ProtoSchemaError("strings/bytes cannot be packed")
        out.append(_scalar_value(ftype, wt, raw, registry, type_name))
    return out


def decode_message(
    payload: bytes, registry: dict, message_type: str
) -> dict:
    """Binary message → dict (proto-JSON-ish: omitted fields absent,
    bytes base64, enums by name, maps as objects, unknown fields
    skipped)."""
    desc = registry["messages"].get(message_type)
    if desc is None:
        raise ProtoSchemaError(f"unknown message type {message_type!r}")
    out: dict = {}
    for fno, wt, v in _fields(payload):
        f = desc["fields"].get(fno)
        if f is None:
            continue  # unknown field: skip (compat rule)
        name, ftype = f["name"], f["type"]
        if f.get("map"):
            if wt != _LEN:  # map entries are length-delimited messages
                raise ValueError(
                    f"wire type {wt} != {_LEN} for map field "
                    f"{message_type}.{name}"
                )
            entry = decode_message(v, registry, f["type_name"])
            out.setdefault(name, {})[str(entry.get("key"))] = \
                entry.get("value")
            continue
        if ftype == _T_MESSAGE:
            if wt != _LEN:  # a varint here would recurse into an int
                raise ValueError(
                    f"wire type {wt} != {_LEN} for message field "
                    f"{message_type}.{name}"
                )
            val = decode_message(v, registry, f["type_name"])
        elif f["repeated"] and wt == _LEN and _WIRE_OF[ftype] != _LEN:
            # packed repeated scalars
            out.setdefault(name, []).extend(
                _packed_values(ftype, v, registry, f.get("type_name"))
            )
            continue
        else:
            if wt != _WIRE_OF[ftype]:
                # wire-type mismatch = malformed / wrong schema — the
                # same validation the reference gets from prost
                # descriptors (otlp.py _expect precedent)
                raise ValueError(
                    f"wire type {wt} != {_WIRE_OF[ftype]} for "
                    f"{message_type}.{name}"
                )
            val = _scalar_value(ftype, wt, v, registry, f.get("type_name"))
        if f["repeated"]:
            out.setdefault(name, []).append(val)
        else:
            out[name] = val
    return out


# ---------------------------------------------------------------------------
# encoder (round-trips + fixtures)


def _tag(fno: int, wt: int) -> bytes:
    return _write_varint((fno << 3) | wt)


def _enc_scalar(ftype: int, v, registry, type_name) -> tuple[int, bytes]:
    """→ (wire_type, encoded value bytes without tag)."""
    if ftype == _T_DOUBLE:
        return _I64, struct.pack("<d", float(v))
    if ftype == _T_FLOAT:
        return _I32, struct.pack("<f", float(v))
    if ftype in (_T_INT64, _T_INT32):
        return _VARINT, _write_varint(int(v) & ((1 << 64) - 1))
    if ftype in (_T_UINT64, _T_UINT32):
        return _VARINT, _write_varint(int(v))
    if ftype in (_T_SINT32, _T_SINT64):
        return _VARINT, _write_varint(_zig(int(v)))
    if ftype == _T_FIXED64:
        return _I64, int(v).to_bytes(8, "little")
    if ftype == _T_SFIXED64:
        return _I64, (int(v) & ((1 << 64) - 1)).to_bytes(8, "little")
    if ftype == _T_FIXED32:
        return _I32, int(v).to_bytes(4, "little")
    if ftype == _T_SFIXED32:
        return _I32, (int(v) & ((1 << 32) - 1)).to_bytes(4, "little")
    if ftype == _T_BOOL:
        return _VARINT, _write_varint(1 if v else 0)
    if ftype == _T_STRING:
        raw = str(v).encode("utf-8")
        return _LEN, _write_varint(len(raw)) + raw
    if ftype == _T_BYTES:
        raw = base64.b64decode(v) if isinstance(v, str) else bytes(v)
        return _LEN, _write_varint(len(raw)) + raw
    if ftype == _T_ENUM:
        syms = registry["enums"].get(type_name, {})
        if isinstance(v, str):
            inv = {s: n for n, s in syms.items()}
            v = inv.get(v, 0)
        return _VARINT, _write_varint(int(v))
    raise ProtoSchemaError(f"unsupported scalar type {ftype}")


def encode_message(value: dict, registry: dict, message_type: str) -> bytes:
    desc = registry["messages"][message_type]
    out = bytearray()
    for fno in sorted(desc["fields"]):
        f = desc["fields"][fno]
        name = f["name"]
        if name not in value or value[name] is None:
            continue
        v = value[name]
        ftype = f["type"]
        if f.get("map"):
            for k, mv in v.items():
                entry = encode_message(
                    {"key": k, "value": mv}, registry, f["type_name"]
                )
                out += _tag(fno, _LEN) + _write_varint(len(entry)) + entry
            continue
        if ftype == _T_MESSAGE:
            items = v if f["repeated"] else [v]
            for item in items:
                body = encode_message(item, registry, f["type_name"])
                out += _tag(fno, _LEN) + _write_varint(len(body)) + body
            continue
        if f["repeated"]:
            if not v:
                # empty repeated has no wire representation in
                # canonical proto3 (an empty packed field would be
                # nonstandard bloat) — omit, like an empty map
                continue
            wire = _WIRE_OF[ftype]
            if wire != _LEN:
                # proto3 default: packed numerics
                body = bytearray()
                for item in v:
                    _, enc = _enc_scalar(ftype, item, registry,
                                         f.get("type_name"))
                    body += enc
                out += _tag(fno, _LEN) + _write_varint(len(body)) + body
            else:
                for item in v:
                    wt, enc = _enc_scalar(ftype, item, registry,
                                          f.get("type_name"))
                    out += _tag(fno, wt) + enc
            continue
        wt, enc = _enc_scalar(ftype, v, registry, f.get("type_name"))
        out += _tag(fno, wt) + enc
    return bytes(out)


# ---------------------------------------------------------------------------
# FileDescriptorSet parsing — self-hosted: descriptor.proto is itself a
# protobuf schema (public), expressed here in this module's own
# descriptor format and decoded with decode_message.  Field numbers
# from google/protobuf/descriptor.proto.


def _f(name, num, ftype, *, repeated=False, type_name=None, map_=False):
    return {
        "name": name, "num": num, "type": ftype, "repeated": repeated,
        "type_name": type_name, "map": map_,
    }


_DESCRIPTOR_REGISTRY = {
    "messages": {
        "google.protobuf.FileDescriptorSet": {
            "name": "google.protobuf.FileDescriptorSet",
            "fields": {1: _f("file", 1, _T_MESSAGE, repeated=True,
                             type_name="google.protobuf.FileDescriptorProto")},
        },
        "google.protobuf.FileDescriptorProto": {
            "name": "google.protobuf.FileDescriptorProto",
            "fields": {
                1: _f("name", 1, _T_STRING),
                2: _f("package", 2, _T_STRING),
                4: _f("message_type", 4, _T_MESSAGE, repeated=True,
                      type_name="google.protobuf.DescriptorProto"),
                5: _f("enum_type", 5, _T_MESSAGE, repeated=True,
                      type_name="google.protobuf.EnumDescriptorProto"),
            },
        },
        "google.protobuf.DescriptorProto": {
            "name": "google.protobuf.DescriptorProto",
            "fields": {
                1: _f("name", 1, _T_STRING),
                2: _f("field", 2, _T_MESSAGE, repeated=True,
                      type_name="google.protobuf.FieldDescriptorProto"),
                3: _f("nested_type", 3, _T_MESSAGE, repeated=True,
                      type_name="google.protobuf.DescriptorProto"),
                4: _f("enum_type", 4, _T_MESSAGE, repeated=True,
                      type_name="google.protobuf.EnumDescriptorProto"),
                7: _f("options", 7, _T_MESSAGE,
                      type_name="google.protobuf.MessageOptions"),
            },
        },
        "google.protobuf.FieldDescriptorProto": {
            "name": "google.protobuf.FieldDescriptorProto",
            "fields": {
                1: _f("name", 1, _T_STRING),
                3: _f("number", 3, _T_INT32),
                4: _f("label", 4, _T_ENUM),
                5: _f("type", 5, _T_ENUM),
                6: _f("type_name", 6, _T_STRING),
            },
        },
        "google.protobuf.EnumDescriptorProto": {
            "name": "google.protobuf.EnumDescriptorProto",
            "fields": {
                1: _f("name", 1, _T_STRING),
                2: _f("value", 2, _T_MESSAGE, repeated=True,
                      type_name="google.protobuf.EnumValueDescriptorProto"),
            },
        },
        "google.protobuf.EnumValueDescriptorProto": {
            "name": "google.protobuf.EnumValueDescriptorProto",
            "fields": {
                1: _f("name", 1, _T_STRING),
                2: _f("number", 2, _T_INT32),
            },
        },
        "google.protobuf.MessageOptions": {
            "name": "google.protobuf.MessageOptions",
            "fields": {7: _f("map_entry", 7, _T_BOOL)},
        },
    },
    "enums": {},
}

_LABEL_REPEATED = 3


def parse_descriptor_set(blob: bytes) -> dict:
    """Binary FileDescriptorSet → registry (the reference's `desc_file`
    contract, protobuf.rs:79,118 — parsed with our own decoder)."""
    fds = decode_message(
        blob, _DESCRIPTOR_REGISTRY, "google.protobuf.FileDescriptorSet"
    )
    registry: dict = {"messages": {}, "enums": {}}
    for fdp in fds.get("file", []):
        pkg = fdp.get("package", "")
        for m in fdp.get("message_type", []):
            _add_descriptor_message(m, pkg, registry)
        for e in fdp.get("enum_type", []):
            _add_descriptor_enum(e, pkg, registry)
    _resolve_type_names(registry)
    return registry


def _add_descriptor_message(m: dict, prefix: str, registry: dict) -> None:
    fq = f"{prefix}.{m['name']}" if prefix else m["name"]
    map_entry = bool(m.get("options", {}).get("map_entry"))
    fields: dict[int, dict] = {}
    for fd in m.get("field", []):
        # enum-valued type/label decode to their raw numbers as strings
        # when no enum table is given; normalize
        ftype = int(fd["type"]) if not isinstance(fd["type"], bool) else 0
        fields[int(fd["number"])] = _f(
            fd["name"], int(fd["number"]), ftype,
            repeated=int(fd.get("label", 1)) == _LABEL_REPEATED,
            type_name=fd.get("type_name", "").lstrip("."),
        )
    registry["messages"][fq] = {
        "name": fq, "fields": fields, "_map_entry": map_entry,
    }
    for nested in m.get("nested_type", []):
        _add_descriptor_message(nested, fq, registry)
    for e in m.get("enum_type", []):
        _add_descriptor_enum(e, fq, registry)


def _add_descriptor_enum(e: dict, prefix: str, registry: dict) -> None:
    fq = f"{prefix}.{e['name']}" if prefix else e["name"]
    registry["enums"][fq] = {
        int(v["number"]): v["name"] for v in e.get("value", [])
    }


def _resolve_type_names(registry: dict) -> None:
    """Mark map fields (entry message has map_entry=true) and validate
    type references."""
    for m in registry["messages"].values():
        for fld in m["fields"].values():
            tn = fld.get("type_name") or None
            fld["type_name"] = tn
            if fld["type"] == _T_MESSAGE and tn:
                entry = registry["messages"].get(tn)
                if entry is not None and entry.get("_map_entry"):
                    fld["map"] = True


# ---------------------------------------------------------------------------
# .proto source parser (subset)

_TOKEN_RE = re.compile(
    r"""//[^\n]*|/\*.*?\*/|"(?:[^"\\]|\\.)*"|[A-Za-z_][\w.]*|\d+|[{}=;<>,\[\]]""",
    re.DOTALL,
)


def parse_proto_text(src: str) -> dict:
    """`.proto` source → registry.  Subset: syntax/package/option/import
    headers, message (nested), enum, repeated/optional/required labels,
    oneof (flattened — wire-identical), map<K,V> (synthesized entry
    message per the spec's map encoding)."""
    toks = [t for t in _TOKEN_RE.findall(src)
            if not t.startswith("//") and not t.startswith("/*")]
    registry: dict = {"messages": {}, "enums": {}}
    pos = 0
    package = ""

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take(expect=None):
        nonlocal pos
        if pos >= len(toks):
            raise ProtoSchemaError("unexpected end of .proto source")
        t = toks[pos]
        pos += 1
        if expect is not None and t != expect:
            raise ProtoSchemaError(f"expected {expect!r}, got {t!r}")
        return t

    def skip_statement():
        nonlocal pos
        while pos < len(toks) and toks[pos] != ";":
            pos += 1
        pos += 1

    def parse_enum(prefix):
        name = take()
        fq = f"{prefix}.{name}" if prefix else name
        take("{")
        syms = {}
        while peek() != "}":
            sym = take()
            if sym == "option" or sym == "reserved":
                skip_statement()
                continue
            take("=")
            num = int(take())
            take(";")
            syms[num] = sym
        take("}")
        registry["enums"][fq] = syms
        return fq

    def field_type(tok, prefix):
        """→ (type number, type_name or unresolved token)."""
        if tok in _SCALAR_NAMES:
            return _SCALAR_NAMES[tok], None
        return None, tok  # message or enum ref; resolved later

    def parse_message(prefix):
        name = take()
        fq = f"{prefix}.{name}" if prefix else name
        fields: dict[int, dict] = {}
        registry["messages"][fq] = {"name": fq, "fields": fields}
        take("{")
        while peek() != "}":
            t = take()
            if t == "message":
                parse_message(fq)
                continue
            if t == "enum":
                parse_enum(fq)
                continue
            if t in ("option", "reserved"):
                skip_statement()
                continue
            if t == "oneof":
                take()  # oneof name
                take("{")
                while peek() != "}":
                    ot = take()
                    _add_field(fields, ot, fq, repeated=False)
                take("}")
                continue
            repeated = False
            if t in ("repeated", "optional", "required"):
                repeated = t == "repeated"
                t = take()
            if t == "map":
                take("<")
                ktok = take()
                take(",")
                vtok = take()
                take(">")
                fname = take()
                take("=")
                fnum = int(take())
                take(";")
                # synthesize the spec's map-entry message
                entry_fq = f"{fq}.{_camel(fname)}Entry"
                ktype, _ = field_type(ktok, fq)
                vtype, vref = field_type(vtok, fq)
                registry["messages"][entry_fq] = {
                    "name": entry_fq,
                    "fields": {
                        1: _f("key", 1, ktype),
                        2: _f("value", 2,
                              vtype if vtype is not None else _T_MESSAGE,
                              type_name=vref),
                    },
                    "_map_entry": True,
                }
                fields[fnum] = _f(fname, fnum, _T_MESSAGE, repeated=True,
                                  type_name=entry_fq, map_=True)
                continue
            _add_field(fields, t, fq, repeated=repeated)
        take("}")
        return fq

    def _add_field(fields, type_tok, scope, *, repeated):
        ftype, ref = field_type(type_tok, scope)
        fname = take()
        take("=")
        fnum = int(take())
        if peek() == "[":  # field options: skip to ;
            skip_statement()
        else:
            take(";")
        fields[fnum] = _f(
            fname, fnum, ftype if ftype is not None else _T_MESSAGE,
            repeated=repeated, type_name=ref,
        )

    while pos < len(toks):
        t = take()
        if t in ("syntax", "option", "import"):
            skip_statement()
        elif t == "package":
            package = take()
            take(";")
        elif t == "message":
            parse_message(package)
        elif t == "enum":
            parse_enum(package)
        elif t == ";":
            continue
        else:
            raise ProtoSchemaError(f"unexpected token {t!r} at top level")

    _resolve_refs(registry, package)
    return registry


def _camel(s: str) -> str:
    return "".join(p.capitalize() for p in s.split("_"))


def _resolve_refs(registry: dict, package: str) -> None:
    """Resolve message/enum name references: try the scope chain from
    innermost to package root to bare name; classify enum refs."""
    msgs, enums = registry["messages"], registry["enums"]

    def resolve(ref: str, scope: str) -> str:
        if ref.startswith("."):
            ref = ref[1:]
        cands = []
        parts = scope.split(".") if scope else []
        for k in range(len(parts), -1, -1):
            prefix = ".".join(parts[:k])
            cands.append(f"{prefix}.{ref}" if prefix else ref)
        for c in cands:
            if c in msgs or c in enums:
                return c
        raise ProtoSchemaError(f"unresolved type {ref!r} in {scope!r}")

    for m in msgs.values():
        for fld in m["fields"].values():
            ref = fld.get("type_name")
            if ref is None or ref in msgs or ref in enums:
                continue
            fq = resolve(ref, m["name"])
            fld["type_name"] = fq
            if fq in enums and fld["type"] == _T_MESSAGE:
                fld["type"] = _T_ENUM


# ---------------------------------------------------------------------------
# Spark surfaces


def proto_spark_ddl(registry: dict, message_type: str) -> str:
    """Descriptor → Spark DDL for `from_json` over decode output.
    uint64/fixed64 map to decimal(20,0) (can exceed bigint); bytes are
    base64 strings; enums are name strings."""
    return _msg_ddl(registry, message_type, top=True)


_DDL_OF = {
    _T_DOUBLE: "double", _T_FLOAT: "float", _T_INT64: "bigint",
    _T_UINT64: "decimal(20,0)", _T_INT32: "int", _T_FIXED64: "decimal(20,0)",
    _T_FIXED32: "bigint", _T_BOOL: "boolean", _T_STRING: "string",
    _T_BYTES: "string", _T_UINT32: "bigint", _T_ENUM: "string",
    _T_SFIXED32: "int", _T_SFIXED64: "bigint", _T_SINT32: "int",
    _T_SINT64: "bigint",
}


def _msg_ddl(registry: dict, message_type: str, top: bool = False) -> str:
    desc = registry["messages"][message_type]
    parts = []
    for fno in sorted(desc["fields"]):
        fld = desc["fields"][fno]
        if fld.get("map"):
            entry = registry["messages"][fld["type_name"]]
            vf = entry["fields"][2]
            vddl = (_msg_ddl(registry, vf["type_name"])
                    if vf["type"] == _T_MESSAGE else _DDL_OF[vf["type"]])
            t = f"map<string,{vddl}>"
        elif fld["type"] == _T_MESSAGE:
            t = _msg_ddl(registry, fld["type_name"])
            if fld["repeated"]:
                t = f"array<{t}>"
        else:
            t = _DDL_OF[fld["type"]]
            if fld["repeated"]:
                t = f"array<{t}>"
        sep = " " if top else ":"
        parts.append(f"{fld['name']}{sep}{t}")
    inner = ", ".join(parts)
    return inner if top else f"struct<{inner}>"


def decode_protobuf_py(
    col: Column, registry: dict, message_type: str
) -> Column:
    """binary → JSON string of the decoded message (NULL on invalid —
    error-channel convention).  Arrow-batched; pair with
    `F.from_json(..., proto_spark_ddl(registry, message_type))`."""
    if message_type not in registry["messages"]:
        raise ProtoSchemaError(f"unknown message type {message_type!r}")

    @F.pandas_udf("string")
    def _dec(vals: pd.Series) -> pd.Series:
        def run(b):
            if b is None:
                return None
            try:
                v = decode_message(bytes(b), registry, message_type)
            except (ValueError, TypeError, ProtoSchemaError):
                # TypeError is defense-in-depth: wire types are
                # validated before recursion, but malformed input must
                # follow the NULL-on-invalid channel, never kill a task
                return None
            return json.dumps(v, separators=(",", ":"), sort_keys=True)

        return vals.map(run)

    return _dec(col)


def from_protobuf_py(
    col: Column, registry: dict, message_type: str
) -> Column:
    """Jar-free drop-in for `from_protobuf`: binary → typed struct."""
    ddl = _msg_ddl(registry, message_type)  # struct<name:type, ...>
    return F.from_json(decode_protobuf_py(col, registry, message_type), ddl)


def encode_protobuf_py(
    registry: dict, message_type: str, *cols: Column, field_names=None
) -> Column:
    """Named columns → binary message per row (encoder seam for
    round-trips; default field order = ascending field number)."""
    desc = registry["messages"][message_type]
    if field_names is None:
        field_names = [desc["fields"][n]["name"]
                       for n in sorted(desc["fields"])][: len(cols)]

    @F.pandas_udf("binary")
    def _enc(pdf: pd.DataFrame) -> pd.Series:
        def run(row):
            return encode_message(
                {k: row[k] for k in field_names if row[k] is not None},
                registry, message_type,
            )

        return pdf.apply(run, axis=1)

    return _enc(F.struct(*[c.alias(n) for c, n in zip(cols, field_names)]))


def encode_descriptor_set(registry: dict, *, package: str = "") -> bytes:
    """Registry → binary FileDescriptorSet (fixture builder: lets tests
    exercise parse_descriptor_set without protoc).  Nested message
    structure is flattened into top-level types with their fully-
    qualified names (semantically equivalent for resolution)."""
    file_msg: dict = {"name": "generated.proto", "message_type": [],
                      "enum_type": []}
    if package:
        file_msg["package"] = package

    def strip_pkg(fq: str) -> str:
        return fq[len(package) + 1:] if package and \
            fq.startswith(package + ".") else fq

    for fq, m in registry["messages"].items():
        dp: dict = {"name": strip_pkg(fq).replace(".", "_"), "field": []}
        if m.get("_map_entry"):
            dp["options"] = {"map_entry": True}
        for fno in sorted(m["fields"]):
            fld = m["fields"][fno]
            fd = {"name": fld["name"], "number": fno,
                  "label": _LABEL_REPEATED if fld["repeated"] else 1,
                  "type": fld["type"]}
            if fld.get("type_name"):
                fd["type_name"] = "." + (
                    f"{package}." if package else ""
                ) + strip_pkg(fld["type_name"]).replace(".", "_")
            dp["field"].append(fd)
        file_msg["message_type"].append(dp)
    for fq, syms in registry["enums"].items():
        file_msg["enum_type"].append({
            "name": strip_pkg(fq).replace(".", "_"),
            "value": [{"name": s, "number": n} for n, s in syms.items()],
        })
    return encode_message(
        {"file": [file_msg]}, _DESCRIPTOR_REGISTRY,
        "google.protobuf.FileDescriptorSet",
    )
