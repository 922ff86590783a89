"""Avro codec — pure-Python binary decoder/encoder + object container
file reader, jar-free.

The reference decodes Avro datums against a JSON schema string and
optionally strips the 5-byte Confluent schema-registry prefix
(`lib/codecs/src/decoding/format/avro.rs:20-21,101-135` —
CONFLUENT_MAGIC_BYTE / CONFLUENT_SCHEMA_PREFIX_LEN; encoder at
`lib/codecs/src/encoding/format/avro.rs`).  `readers.decode_avro`
already wraps Spark's `from_avro` for clusters that carry the
spark-avro jar; this module removes the jar dependency entirely — the
same precedent as the MMDB reader (enrich_mmdb.py) and the OTLP wire
decoder (sources/otlp.py): the format is a small public spec
(https://avro.apache.org/docs/current/specification/), so implement it
directly and keep the Spark seam Arrow-batched.

Spec coverage: all eight primitives, record / enum / array / map /
union / fixed, named-type references, zigzag varints, block-encoded
arrays/maps (including negative block counts with byte sizes), object
container files with `null` and `deflate` codecs, and the Confluent
prefix.  Logical types: timestamp-millis/micros and time-micros pass
through as their underlying long and uuid as string — exactly the
reference's mapping (avro.rs:222-232 forwards the raw i64 / the
hyphenated string).  Where the reference ERRORS (avro.rs:193-204
rejects Date, Decimal, Fixed, TimeMillis outright) this codec does
strictly more: fixed decodes as bytes, date/time-millis pass through
as ints, and `decimal` (bytes/fixed, the big-endian two's-complement
unscaled form) decodes to an exact decimal STRING honoring the
schema's scale — JSON-safe and `from_json`-castable to
``decimal(p,s)``.

Scale notes: decoding is an Arrow-batched pandas UDF (one Python call
per ~10k-row batch, not per row); container files parallelize per
file via the binaryFile source — the right unit for Avro, whose blocks
are sequential within a file but independent across files.  Output is
a JSON string column consumed by `from_json` with the DDL derived by
`avro_spark_ddl`, so everything downstream of the decode is JVM-side.
"""

from __future__ import annotations

import json
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, functions as F

MAGIC = b"Obj\x01"

#: Confluent wire format: magic byte 0 + big-endian 4-byte schema id
#: (avro.rs:20-21)
CONFLUENT_PREFIX_LEN = 5

_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string",
}


# ---------------------------------------------------------------------------
# schema model


class AvroSchemaError(ValueError):
    pass


def parse_schema(schema: str | dict | list) -> dict:
    """JSON schema → normalized dict form with named types resolvable
    by (fully-qualified) name.  Returns ``{"root": node, "names":
    {fqname: node}}`` where every node is one of:
    ``{"type": primitive}``, ``{"type": "record", ...}``,
    ``{"type": "enum", ...}``, ``{"type": "fixed", ...}``,
    ``{"type": "array", "items": node}``,
    ``{"type": "map", "values": node}``,
    ``{"type": "union", "branches": [node, ...]}``."""
    if isinstance(schema, str):
        try:
            schema = json.loads(schema)
        except json.JSONDecodeError:
            # bare primitive name, e.g. '"string"' already handled;
            # allow plain `string`
            schema = schema.strip().strip('"')
    names: dict[str, dict] = {}
    root = _norm(schema, names, namespace="")
    return {"root": root, "names": names}


def _fq(name: str, namespace: str) -> str:
    return name if "." in name or not namespace else f"{namespace}.{name}"


def _norm(s, names: dict, namespace: str) -> dict:
    if isinstance(s, str):
        if s in _PRIMITIVES:
            return {"type": s}
        fq = _fq(s, namespace)
        if fq in names:
            return {"type": "ref", "name": fq}
        if s in names:
            return {"type": "ref", "name": s}
        raise AvroSchemaError(f"unknown type name {s!r}")
    if isinstance(s, list):
        return {
            "type": "union",
            "branches": [_norm(b, names, namespace) for b in s],
        }
    if not isinstance(s, dict):
        raise AvroSchemaError(f"bad schema node {s!r}")
    t = s.get("type")
    if t in _PRIMITIVES:
        node = {"type": t}
        if s.get("logicalType") == "decimal" and t == "bytes":
            node["logical"] = "decimal"
            node["scale"] = int(s.get("scale", 0))
            node["precision"] = int(s.get("precision", 38))
        return node
    if t == "record":
        ns = s.get("namespace", namespace)
        fq = _fq(s["name"], ns)
        node = {"type": "record", "name": fq, "fields": []}
        names[fq] = node  # register before children (recursive types)
        for f in s.get("fields", []):
            fd = {"name": f["name"], "schema": _norm(f["type"], names, ns)}
            if "default" in f:
                fd["default"] = f["default"]
            if f.get("aliases"):
                fd["aliases"] = list(f["aliases"])
            node["fields"].append(fd)
        return node
    if t == "enum":
        fq = _fq(s["name"], s.get("namespace", namespace))
        node = {"type": "enum", "name": fq, "symbols": list(s["symbols"])}
        if "default" in s:
            node["default"] = s["default"]
        names[fq] = node
        return node
    if t == "fixed":
        fq = _fq(s["name"], s.get("namespace", namespace))
        node = {"type": "fixed", "name": fq, "size": int(s["size"])}
        if s.get("logicalType") == "decimal":
            node["logical"] = "decimal"
            node["scale"] = int(s.get("scale", 0))
            node["precision"] = int(s.get("precision", 38))
        names[fq] = node
        return node
    if t == "array":
        return {"type": "array", "items": _norm(s["items"], names, namespace)}
    if t == "map":
        return {"type": "map", "values": _norm(s["values"], names, namespace)}
    if isinstance(t, (dict, list)):
        # {"type": {...}} wrapper / union-in-type
        return _norm(t, names, namespace)
    raise AvroSchemaError(f"unsupported schema type {t!r}")


def _deref(node: dict, names: dict) -> dict:
    while node["type"] == "ref":
        node = names[node["name"]]
    return node


# ---------------------------------------------------------------------------
# binary decode (spec: zigzag varints, LE floats, length-prefixed
# bytes/string, block-encoded arrays/maps, union = long index + value)


def _read_long(b: bytes, i: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        if i >= len(b):
            raise ValueError("truncated avro varint")
        byte = b[i]
        out |= (byte & 0x7F) << shift
        i += 1
        if not byte & 0x80:
            return (out >> 1) ^ -(out & 1), i  # zigzag
        shift += 7
        if shift > 69:
            raise ValueError("avro varint too long")


def _read_datum(node: dict, names: dict, b: bytes, i: int):
    node = _deref(node, names)
    t = node["type"]
    if t == "null":
        return None, i
    if t == "boolean":
        if i >= len(b):
            raise ValueError("truncated boolean")
        return b[i] != 0, i + 1
    if t in ("int", "long"):
        return _read_long(b, i)
    if t == "float":
        if i + 4 > len(b):
            raise ValueError("truncated float")
        return struct.unpack_from("<f", b, i)[0], i + 4
    if t == "double":
        if i + 8 > len(b):
            raise ValueError("truncated double")
        return struct.unpack_from("<d", b, i)[0], i + 8
    if t in ("bytes", "string"):
        n, i = _read_long(b, i)
        if n < 0 or i + n > len(b):
            raise ValueError("truncated bytes/string")
        raw = b[i : i + n]
        return (raw.decode("utf-8") if t == "string" else bytes(raw)), i + n
    if t == "fixed":
        n = node["size"]
        if i + n > len(b):
            raise ValueError("truncated fixed")
        return bytes(b[i : i + n]), i + n
    if t == "enum":
        idx, i = _read_long(b, i)
        syms = node["symbols"]
        if not 0 <= idx < len(syms):
            raise ValueError(f"enum index {idx} out of range")
        return syms[idx], i
    if t == "union":
        idx, i = _read_long(b, i)
        branches = node["branches"]
        if not 0 <= idx < len(branches):
            raise ValueError(f"union index {idx} out of range")
        return _read_datum(branches[idx], names, b, i)
    if t == "array":
        out = []
        while True:
            cnt, i = _read_long(b, i)
            if cnt == 0:
                return out, i
            if cnt < 0:  # block byte-size follows (spec: fast skipping)
                cnt = -cnt
                _, i = _read_long(b, i)
            for _ in range(cnt):
                v, i = _read_datum(node["items"], names, b, i)
                out.append(v)
    if t == "map":
        out = {}
        while True:
            cnt, i = _read_long(b, i)
            if cnt == 0:
                return out, i
            if cnt < 0:
                cnt = -cnt
                _, i = _read_long(b, i)
            for _ in range(cnt):
                k, i = _read_datum({"type": "string"}, names, b, i)
                v, i = _read_datum(node["values"], names, b, i)
                out[k] = v
    if t == "record":
        out = {}
        for f in node["fields"]:
            out[f["name"]], i = _read_datum(f["schema"], names, b, i)
        return out, i
    raise AvroSchemaError(f"unsupported type {t!r}")


def decode_datum(schema: dict, payload: bytes, *, strict: bool = True):
    """Decode one binary datum against a parsed schema; `strict` also
    rejects trailing bytes (a datum stream should consume exactly)."""
    v, i = _read_datum(schema["root"], schema["names"], payload, 0)
    if strict and i != len(payload):
        raise ValueError(f"{len(payload) - i} trailing bytes after datum")
    return v


# ---------------------------------------------------------------------------
# binary encode (round-trip tests + the roundtrip driver query)


def _write_long(v: int) -> bytes:
    # zigzag over python's arbitrary-width ints (no fixed-width >> -1)
    v = (v << 1) if v >= 0 else (((-v - 1) << 1) | 1)
    out = bytearray()
    while True:
        bits = v & 0x7F
        v >>= 7
        if v:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def _union_index(branches: list[dict], names: dict, v) -> int:
    """Pick the first branch whose type matches the Python value —
    enough for the [null, T] / [T, null] unions the codec emits."""
    def matches(node: dict) -> bool:
        node = _deref(node, names)
        t = node["type"]
        if v is None:
            return t == "null"
        if isinstance(v, bool):
            return t == "boolean"
        if isinstance(v, int):
            return t in ("int", "long")
        if isinstance(v, float):
            return t in ("float", "double")
        if isinstance(v, str):
            # a decimal logical branch accepts its string rendering
            return t in ("string", "enum") or (
                t in ("bytes", "fixed")
                and node.get("logical") == "decimal"
            )
        if isinstance(v, bytes):
            return t in ("bytes", "fixed")
        if isinstance(v, list):
            return t == "array"
        if isinstance(v, dict):
            return t in ("map", "record")
        return False

    for idx, br in enumerate(branches):
        if matches(br):
            return idx
    raise ValueError(f"no union branch for {type(v).__name__}")


def _write_datum(node: dict, names: dict, v, out: bytearray) -> None:
    node = _deref(node, names)
    t = node["type"]
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if v else 0)
    elif t in ("int", "long"):
        out += _write_long(int(v))
    elif t == "float":
        out += struct.pack("<f", float(v))
    elif t == "double":
        out += struct.pack("<d", float(v))
    elif t == "string":
        raw = str(v).encode("utf-8")
        out += _write_long(len(raw))
        out += raw
    elif t == "bytes":
        if node.get("logical") == "decimal" and not isinstance(
            v, (bytes, bytearray)
        ):
            v = _decimal_bytes(v, node["scale"])
        out += _write_long(len(v))
        out += bytes(v)
    elif t == "fixed":
        if node.get("logical") == "decimal" and not isinstance(
            v, (bytes, bytearray)
        ):
            raw = _decimal_bytes(v, node["scale"])
            if len(raw) > node["size"]:
                raise ValueError("decimal overflows fixed size")
            pad = b"\xff" if raw[0] & 0x80 else b"\x00"
            v = pad * (node["size"] - len(raw)) + raw
        if len(v) != node["size"]:
            raise ValueError("fixed size mismatch")
        out += bytes(v)
    elif t == "enum":
        out += _write_long(node["symbols"].index(v))
    elif t == "union":
        idx = _union_index(node["branches"], names, v)
        out += _write_long(idx)
        _write_datum(node["branches"][idx], names, v, out)
    elif t == "array":
        if v:
            out += _write_long(len(v))
            for item in v:
                _write_datum(node["items"], names, item, out)
        out += _write_long(0)
    elif t == "map":
        if v:
            out += _write_long(len(v))
            for k, mv in v.items():
                _write_datum({"type": "string"}, names, k, out)
                _write_datum(node["values"], names, mv, out)
        out += _write_long(0)
    elif t == "record":
        for f in node["fields"]:
            _write_datum(f["schema"], names, v.get(f["name"]), out)
    else:
        raise AvroSchemaError(f"unsupported type {t!r}")


def encode_datum(schema: dict, value) -> bytes:
    out = bytearray()
    _write_datum(schema["root"], schema["names"], value, out)
    return bytes(out)


# ---------------------------------------------------------------------------
# object container files (spec §"Object Container Files")


def read_container(blob: bytes, *, reader: dict | None = None) -> tuple[dict, list]:
    """Container bytes → (parsed writer schema, list of decoded
    records).  With ``reader``, each record resolves into the reader's
    shape (spec schema resolution) as it is read."""
    if blob[:4] != MAGIC:
        raise ValueError("not an Avro container (bad magic)")
    meta_schema = parse_schema(
        {"type": "map", "values": "bytes"}
    )
    meta, i = _read_datum(
        meta_schema["root"], meta_schema["names"], blob, 4
    )
    sync = blob[i : i + 16]
    i += 16
    schema = parse_schema(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    records = []
    n = len(blob)
    while i < n:
        cnt, i = _read_long(blob, i)
        size, i = _read_long(blob, i)
        block = blob[i : i + size]
        i += size
        if blob[i : i + 16] != sync:
            raise ValueError("container sync marker mismatch")
        i += 16
        if codec == "deflate":
            block = zlib.decompress(block, -15)  # raw deflate per spec
        elif codec != "null":
            raise ValueError(f"unsupported container codec {codec!r}")
        j = 0
        for _ in range(cnt):
            if reader is not None:
                v, j = _read_resolved(
                    schema["root"], reader["root"],
                    schema["names"], reader["names"], block, j,
                )
            else:
                v, j = _read_datum(
                    schema["root"], schema["names"], block, j
                )
            records.append(v)
    return schema, records


def write_container(
    schema_json: str,
    records: list,
    *,
    codec: str = "null",
    sync: bytes = b"vector-spark-syn",
    block_records: int = 1000,
) -> bytes:
    """Records → container bytes (deterministic: caller-fixed sync
    marker, fixed block size — reproducible fixtures)."""
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    schema = parse_schema(schema_json)
    meta = {"avro.schema": schema_json.encode("utf-8"),
            "avro.codec": codec.encode("utf-8")}
    out = bytearray(MAGIC)
    meta_schema = parse_schema({"type": "map", "values": "bytes"})
    _write_datum(meta_schema["root"], meta_schema["names"], meta, out)
    out += sync
    for start in range(0, len(records), block_records):
        chunk = records[start : start + block_records]
        body = bytearray()
        for r in chunk:
            _write_datum(schema["root"], schema["names"], r, body)
        body = bytes(body)
        if codec == "deflate":
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            body = co.compress(body) + co.flush()
        elif codec != "null":
            raise ValueError(f"unsupported container codec {codec!r}")
        out += _write_long(len(chunk))
        out += _write_long(len(body))
        out += body
        out += sync
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark schema mapping + JSON rendering


def avro_spark_ddl(schema: str | dict) -> str:
    """Avro schema → Spark DDL for `from_json` over the decoder's JSON
    output.  bytes/fixed render as base64 STRING (JSON has no binary;
    decode with `unbase64` downstream); non-null multi-branch unions
    are rejected with guidance (same stance as the VRL value model,
    which would force a tagged representation)."""
    parsed = schema if isinstance(schema, dict) and "root" in schema \
        else parse_schema(schema)
    return _ddl(parsed["root"], parsed["names"], top=True)


def _ddl(node: dict, names: dict, top: bool = False) -> str:
    node = _deref(node, names)
    t = node["type"]
    if node.get("logical") == "decimal":
        return f"decimal({node['precision']},{node['scale']})"
    simple = {
        "null": "string",  # a top-level null field: always-null string
        "boolean": "boolean", "int": "int", "long": "bigint",
        "float": "float", "double": "double",
        "bytes": "string", "string": "string", "fixed": "string",
        "enum": "string",
    }
    if t in simple:
        return simple[t]
    if t == "union":
        non_null = [
            b for b in node["branches"]
            if _deref(b, names)["type"] != "null"
        ]
        if len(non_null) != 1:
            raise AvroSchemaError(
                "multi-branch non-null unions have no flat Spark type; "
                "restructure as a record of optional branches"
            )
        return _ddl(non_null[0], names)
    if t == "array":
        return f"array<{_ddl(node['items'], names)}>"
    if t == "map":
        return f"map<string,{_ddl(node['values'], names)}>"
    if t == "record":
        if top:
            return ", ".join(
                f"{f['name']} {_ddl(f['schema'], names)}"
                for f in node["fields"]
            )
        return "struct<" + ", ".join(
            f"{f['name']}:{_ddl(f['schema'], names)}"
            for f in node["fields"]
        ) + ">"
    raise AvroSchemaError(f"unsupported type {t!r}")


def _decimal_str(unscaled: int, scale: int) -> str:
    """Exact decimal rendering of a big-endian two's-complement
    unscaled int at the schema's scale (avro spec: decimal logical
    type) — string keeps it JSON-safe and lossless."""
    if scale <= 0:
        return str(unscaled * 10 ** (-scale))
    sign = "-" if unscaled < 0 else ""
    mag = str(abs(unscaled)).rjust(scale + 1, "0")
    return f"{sign}{mag[:-scale]}.{mag[-scale:]}"


def _decimal_bytes(v, scale: int) -> bytes:
    """str/Decimal/int → minimal two's-complement big-endian bytes of
    the unscaled value (the encoder side of the decimal logical
    type)."""
    from decimal import Decimal

    unscaled = int(Decimal(str(v)).scaleb(scale).to_integral_exact())
    n = max(1, (unscaled.bit_length() + 8) // 8)  # +1 bit for the sign
    return unscaled.to_bytes(n, "big", signed=True)


def _jsonable(node: dict, names: dict, v):
    """Decoded Python value → JSON-renderable (bytes → base64)."""
    import base64

    node = _deref(node, names)
    t = node["type"]
    if v is None:
        return None
    if t in ("bytes", "fixed"):
        if node.get("logical") == "decimal":
            return _decimal_str(
                int.from_bytes(v, "big", signed=True), node["scale"]
            )
        return base64.b64encode(v).decode("ascii")
    if t == "union":
        idx = _union_index(node["branches"], names, v)
        return _jsonable(node["branches"][idx], names, v)
    if t == "array":
        return [_jsonable(node["items"], names, x) for x in v]
    if t == "map":
        return {k: _jsonable(node["values"], names, x) for k, x in v.items()}
    if t == "record":
        return {
            f["name"]: _jsonable(f["schema"], names, v.get(f["name"]))
            for f in node["fields"]
        }
    return v


def decode_avro_py(
    col: Column,
    schema_json: str,
    *,
    strip_schema_id_prefix: bool = False,
    reader_schema: str | None = None,
) -> Column:
    """binary → JSON string of the decoded datum (NULL on invalid —
    the error-channel convention).  `strip_schema_id_prefix` drops the
    5-byte Confluent header when the first byte is the magic 0
    (avro.rs:101-135).  `reader_schema` applies spec schema resolution
    (evolution: defaults, skips, promotions, aliases) — output then
    follows the READER's shape.  Arrow-batched; pair with
    `F.from_json(..., avro_spark_ddl(reader_schema or schema))`."""
    schema = parse_schema(schema_json)
    reader = parse_schema(reader_schema) if reader_schema else None
    shape = reader or schema

    @F.pandas_udf("string")
    def _dec(vals: pd.Series) -> pd.Series:
        def run(b):
            if b is None:
                return None
            raw = bytes(b)
            if strip_schema_id_prefix and raw[:1] == b"\x00" \
                    and len(raw) >= CONFLUENT_PREFIX_LEN:
                raw = raw[CONFLUENT_PREFIX_LEN:]
            try:
                v = (decode_datum_resolved(schema, reader, raw)
                     if reader else decode_datum(schema, raw))
            except (ValueError, AvroSchemaError, UnicodeDecodeError):
                return None
            return json.dumps(
                _jsonable(shape["root"], shape["names"], v),
                separators=(",", ":"), sort_keys=True,
            )

        return vals.map(run)

    return _dec(col)


def from_avro_py(
    col: Column, schema_json: str, *, strip_schema_id_prefix: bool = False
) -> Column:
    """Jar-free drop-in for `from_avro`: binary column → typed struct."""
    return F.from_json(
        decode_avro_py(
            col, schema_json, strip_schema_id_prefix=strip_schema_id_prefix
        ),
        _struct_ddl(schema_json),
    )


def _struct_ddl(schema_json: str) -> str:
    parsed = parse_schema(schema_json)
    root = _deref(parsed["root"], parsed["names"])
    if root["type"] != "record":
        raise AvroSchemaError("from_avro_py expects a record schema")
    return "struct<" + ", ".join(
        f"{f['name']}:{_ddl(f['schema'], parsed['names'])}"
        for f in root["fields"]
    ) + ">"


def encode_avro_py(schema_json: str, *cols: Column) -> Column:
    """Record fields → Avro binary datum per row (the encoder seam for
    round-trips; field order = the schema's field order).  Arrow-
    batched over a struct of the inputs."""
    schema = parse_schema(schema_json)
    root = _deref(schema["root"], schema["names"])
    if root["type"] != "record":
        raise AvroSchemaError("encode_avro_py expects a record schema")
    fnames = [f["name"] for f in root["fields"]]

    @F.pandas_udf("binary")
    def _enc(pdf: pd.DataFrame) -> pd.Series:
        def run(row):
            return encode_datum(schema, {k: row[k] for k in fnames})

        return pdf.apply(run, axis=1)

    return _enc(F.struct(*[c.alias(n) for c, n in zip(cols, fnames)]))


def read_avro(
    spark: SparkSession,
    path: str,
    *,
    schema_json: str | None = None,
    reader_schema: str | None = None,
) -> DataFrame:
    """Object container file(s) → typed DataFrame, jar-free.  Files
    load via the binaryFile source and decode inside `mapInPandas`
    (per-file parallelism — Avro blocks are sequential within a file
    but files are independent, the same unit spark-avro uses for
    non-splittable codecs).  If `schema_json` is None the writer
    schema is taken from the first file's header.  `reader_schema`
    applies spec schema resolution PER FILE against each file's own
    writer schema — mixed-generation directories (an evolved producer
    mid-rollout) read into one uniform reader-shaped frame."""
    explicit_schema = schema_json is not None
    if schema_json is None:
        import glob as _glob
        import os as _os

        cands = sorted(_glob.glob(_os.path.join(path, "*.avro"))) \
            if _os.path.isdir(path) else sorted(_glob.glob(path)) or [path]
        # header-only peek: the metadata map sits in the first few KB;
        # no record decodes on the driver
        with open(cands[0], "rb") as fh:
            head = fh.read(1 << 20)
        if head[:4] != MAGIC:
            raise ValueError("not an Avro container (bad magic)")
        meta_schema = parse_schema({"type": "map", "values": "bytes"})
        meta, _ = _read_datum(
            meta_schema["root"], meta_schema["names"], head, 4
        )
        schema_json = meta["avro.schema"].decode("utf-8")
    parsed = parse_schema(reader_schema or schema_json)
    ddl = _struct_ddl(reader_schema or schema_json)
    spark_schema = "value string"
    # an explicitly supplied schema_json acts as the READER schema too:
    # each container resolves its own writer schema against it (spec
    # resolution — renames error, reorders match by name) instead of
    # rendering writer-decoded records through a mismatched shape,
    # which silently NULLed renamed/reordered fields (round-5 advice)
    if reader_schema:
        reader_parsed = parse_schema(reader_schema)
    elif explicit_schema:
        reader_parsed = parsed
    else:
        reader_parsed = None

    binary = spark.read.format("binaryFile").load(path)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                try:
                    _, recs = read_container(
                        bytes(blob), reader=reader_parsed
                    )
                except (ValueError, AvroSchemaError):
                    continue
                root, names = parsed["root"], parsed["names"]
                for r in recs:
                    rows.append(json.dumps(
                        _jsonable(root, names, r),
                        separators=(",", ":"), sort_keys=True,
                    ))
            yield pd.DataFrame({"value": rows})

    decoded = binary.select("content").mapInPandas(gen, spark_schema)
    return decoded.select(
        F.from_json("value", ddl).alias("r")
    ).select("r.*")


def write_avro(
    df: DataFrame,
    path: str,
    schema_json: str,
    *,
    codec: str = "deflate",
    block_records: int = 5000,
) -> list[str]:
    """DataFrame → Avro object container files, one per partition,
    jar-free (the encoder-side counterpart of `read_avro`; reference:
    lib/codecs/src/encoding/format/avro.rs).  Each task encodes its
    partition with `write_container` and writes
    ``part-<pid>.avro`` under ``path`` — embarrassingly parallel, no
    shuffle, no driver funnel.  The 16-byte sync marker derives from
    the partition id, so output is deterministic for a fixed
    partitioning.  Files go through plain ``open()`` — local/NFS/fuse
    filesystems (this container, most on-prem clusters); object-store
    deployments should swap the final write for their FS client or use
    spark-avro.  Returns the written file paths."""
    import os as _os

    _os.makedirs(path, exist_ok=True)
    parsed = parse_schema(schema_json)
    root = _deref(parsed["root"], parsed["names"])
    if root["type"] != "record":
        raise AvroSchemaError("write_avro expects a record schema")
    fnames = [f["name"] for f in root["fields"]]
    cols_df = df.select(*fnames)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        recs: list[dict] = []
        for pdf in batches:
            for row in pdf.to_dict("records"):
                recs.append({
                    k: (None if v is None or (isinstance(v, float) and v != v)
                        else v.item() if hasattr(v, "item") else v)
                    for k, v in row.items()
                })
        if not recs:
            yield pd.DataFrame({"path": [], "n": []})
            return
        sync = f"vs-part-{pid:07d}-".encode("ascii")[:16].ljust(16, b"0")
        blob = write_container(
            schema_json, recs, codec=codec, sync=sync,
            block_records=block_records,
        )
        fpath = _os.path.join(path, f"part-{pid:05d}.avro")
        with open(fpath, "wb") as fh:
            fh.write(blob)
        yield pd.DataFrame({"path": [fpath], "n": [len(recs)]})

    manifest = cols_df.mapInPandas(gen, "path string, n long").collect()
    return [r["path"] for r in manifest if r["path"]]


# ---------------------------------------------------------------------------
# schema resolution (spec §"Schema Resolution") — reader-vs-writer
# evolution: match record fields by name (or reader aliases), fill
# reader-only fields from defaults, skip writer-only fields, promote
# int→long→float→double and string↔bytes, resolve unions by first
# structural match.  The reference decodes with the writer schema only
# (avro.rs builds one Schema); this is the piece a long-lived pipeline
# needs when producers upgrade before consumers.


def _skip_datum(node: dict, names: dict, b: bytes, i: int) -> int:
    """Advance past one datum without materializing it (writer-only
    fields)."""
    _, j = _read_datum(node, names, b, i)
    return j


_PROMOTIONS = {
    "int": {"int", "long", "float", "double"},
    "long": {"long", "float", "double"},
    "float": {"float", "double"},
    "double": {"double"},
    "string": {"string", "bytes"},
    "bytes": {"bytes", "string"},
}


def _resolves(w: dict, r: dict, wn: dict, rn: dict) -> bool:
    """Can writer node w resolve into reader node r? (structural check
    used for union branch selection)"""
    w, r = _deref(w, wn), _deref(r, rn)
    wt, rt = w["type"], r["type"]
    if wt in _PROMOTIONS:
        return rt in _PROMOTIONS[wt]
    if wt != rt:
        return rt == "union" and any(
            _resolves(w, br, wn, rn) for br in r["branches"]
        )
    if wt in ("null", "boolean"):
        return True
    if wt == "fixed":
        # spec: fixed resolves only when names AND sizes match
        return (w["name"].split(".")[-1] == r["name"].split(".")[-1]
                and w["size"] == r["size"])
    if wt in ("record", "enum"):
        return w["name"].split(".")[-1] == r["name"].split(".")[-1]
    if wt == "array":
        return _resolves(w["items"], r["items"], wn, rn)
    if wt == "map":
        return _resolves(w["values"], r["values"], wn, rn)
    if wt == "union":
        return True  # branch chosen per-datum
    return False


def _coerce(v, w: dict, r: dict):
    wt, rt = w["type"], r["type"]
    if wt in ("int", "long") and rt in ("float", "double"):
        return float(v)
    if wt == "float" and rt == "double":
        return v
    if wt == "string" and rt == "bytes":
        return v.encode("utf-8")
    if wt == "bytes" and rt == "string":
        return v.decode("utf-8")
    return v


def _default_value(node: dict, names: dict, default):
    """JSON default → decoded-value space (bytes defaults are
    ISO-8859-1 strings per spec; union defaults use the FIRST
    branch)."""
    node = _deref(node, names)
    t = node["type"]
    if t == "union":
        return _default_value(node["branches"][0], names, default)
    if t in ("bytes", "fixed") and isinstance(default, str):
        return default.encode("latin-1")
    if t == "record":
        return {
            f["name"]: _default_value(f["schema"], names,
                                      (default or {}).get(f["name"]))
            for f in node["fields"]
        }
    return default


def _read_resolved(w: dict, r: dict, wn: dict, rn: dict, b: bytes, i: int):
    w0, r0 = _deref(w, wn), _deref(r, rn)
    wt, rt = w0["type"], r0["type"]
    if wt == "union":
        idx, i = _read_long(b, i)
        return _read_resolved(w0["branches"][idx], r0, wn, rn, b, i)
    if rt == "union" and wt != "union":
        for br in r0["branches"]:
            if _resolves(w0, br, wn, rn):
                return _read_resolved(w0, br, wn, rn, b, i)
        raise AvroSchemaError(
            f"writer {wt!r} matches no reader union branch"
        )
    if rt == "record":
        if wt != "record":
            raise AvroSchemaError(f"cannot resolve {wt!r} into record")
        rfields = {f["name"]: f for f in r0["fields"]}
        # reader aliases: alternate names for writer fields
        for f in r0["fields"]:
            for alias in f.get("aliases", ()):
                rfields.setdefault(alias, f)
        out = {}
        for f in w0["fields"]:
            rf = rfields.get(f["name"])
            if rf is None:
                i = _skip_datum(f["schema"], wn, b, i)
            else:
                out[rf["name"]], i = _read_resolved(
                    f["schema"], rf["schema"], wn, rn, b, i
                )
        for f in r0["fields"]:
            if f["name"] not in out:
                if "default" not in f:
                    raise AvroSchemaError(
                        f"reader field {f['name']!r} absent from writer "
                        "and has no default"
                    )
                out[f["name"]] = _default_value(
                    f["schema"], rn, f["default"]
                )
        return out, i
    if rt == "array":
        if wt != "array":
            raise AvroSchemaError(f"cannot resolve {wt!r} into array")
        out = []
        while True:
            cnt, i = _read_long(b, i)
            if cnt == 0:
                return out, i
            if cnt < 0:
                cnt = -cnt
                _, i = _read_long(b, i)
            for _ in range(cnt):
                v, i = _read_resolved(
                    w0["items"], r0["items"], wn, rn, b, i
                )
                out.append(v)
    if rt == "map":
        if wt != "map":
            raise AvroSchemaError(f"cannot resolve {wt!r} into map")
        out = {}
        while True:
            cnt, i = _read_long(b, i)
            if cnt == 0:
                return out, i
            if cnt < 0:
                cnt = -cnt
                _, i = _read_long(b, i)
            for _ in range(cnt):
                k, i = _read_datum({"type": "string"}, wn, b, i)
                out[k], i = _read_resolved(
                    w0["values"], r0["values"], wn, rn, b, i
                )
    if rt == "enum":
        if wt != "enum":
            raise AvroSchemaError(f"cannot resolve {wt!r} into enum")
        idx, i = _read_long(b, i)
        sym = w0["symbols"][idx]
        if sym in r0["symbols"]:
            return sym, i
        # spec: an unknown writer symbol takes the reader's enum default
        if r0.get("default") is not None:
            return r0["default"], i
        raise AvroSchemaError(f"enum symbol {sym!r} not in reader enum")
    # scalar / fixed: read with the WRITER type, promote to reader
    if not _resolves(w0, r0, wn, rn):
        raise AvroSchemaError(f"cannot resolve {wt!r} into {rt!r}")
    v, i = _read_datum(w0, wn, b, i)
    return _coerce(v, w0, r0), i


def decode_datum_resolved(
    writer: dict, reader: dict, payload: bytes, *, strict: bool = True
):
    """Decode a datum written with ``writer`` under ``reader``'s shape
    (spec schema resolution)."""
    v, i = _read_resolved(
        writer["root"], reader["root"], writer["names"], reader["names"],
        payload, 0,
    )
    if strict and i != len(payload):
        raise ValueError(f"{len(payload) - i} trailing bytes after datum")
    return v
