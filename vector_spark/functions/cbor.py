"""CBOR codec (RFC 8949) — pure-Python decoder/encoder backing VRL's
`parse_cbor` / `encode_cbor` (reference: vrl stdlib parse_cbor — the
serde_cbor path the remap transform exposes; same jar-free codec
precedent as sources/avro.py and sources/protobuf.py).

Coverage: all seven major types — unsigned/negative ints, byte
strings, text strings, arrays, maps, tags (passed through to the
tagged value), simple values (false/true/null/undefined) and
half/single/double floats; definite AND indefinite lengths (streaming
chunked strings, arrays, maps with the 0xFF break).  Bytes render as
base64 in the JSON seam (no binary in JSON), map keys stringify.

Scale: the Spark surface is an Arrow-batched pandas UDF producing a
JSON string column for `from_json` — one Python call per batch, the
codec boundary only; everything downstream stays JVM-side.
"""

from __future__ import annotations

import base64
import json
import struct

import pandas as pd
from pyspark.sql import Column, functions as F

_BREAK = object()


def _read_uint(b: bytes, i: int, info: int) -> tuple[int, int]:
    if info < 24:
        return info, i
    if info == 24:
        return b[i], i + 1
    if info == 25:
        return int.from_bytes(b[i : i + 2], "big"), i + 2
    if info == 26:
        return int.from_bytes(b[i : i + 4], "big"), i + 4
    if info == 27:
        return int.from_bytes(b[i : i + 8], "big"), i + 8
    raise ValueError(f"bad additional info {info}")


def _half_to_float(h: int) -> float:
    # RFC 8949 appendix D reference algorithm
    exp = (h >> 10) & 0x1F
    mant = h & 0x3FF
    if exp == 0:
        val = mant * 2.0**-24
    elif exp != 31:
        val = (mant + 1024) * 2.0 ** (exp - 25)
    else:
        val = float("inf") if mant == 0 else float("nan")
    return -val if h & 0x8000 else val


def _decode(b: bytes, i: int):
    if i >= len(b):
        raise ValueError("truncated CBOR")
    ib = b[i]
    i += 1
    major, info = ib >> 5, ib & 0x1F
    if major == 0:  # unsigned int
        return _read_uint(b, i, info)
    if major == 1:  # negative int
        v, i = _read_uint(b, i, info)
        return -1 - v, i
    if major in (2, 3):  # byte / text string
        if info == 31:  # indefinite: chunks until break
            parts = b""
            while True:
                if b[i] == 0xFF:
                    i += 1
                    break
                if (b[i] >> 5) != major:
                    raise ValueError("mixed chunk type in indefinite string")
                chunk, i = _decode(b, i)
                parts += chunk if major == 2 else chunk.encode("utf-8")
            return (parts if major == 2 else parts.decode("utf-8")), i
        n, i = _read_uint(b, i, info)
        if i + n > len(b):
            raise ValueError("truncated string")
        raw = b[i : i + n]
        return (bytes(raw) if major == 2 else raw.decode("utf-8")), i + n
    if major == 4:  # array
        out = []
        if info == 31:
            while b[i] != 0xFF:
                v, i = _decode(b, i)
                out.append(v)
            return out, i + 1
        n, i = _read_uint(b, i, info)
        for _ in range(n):
            v, i = _decode(b, i)
            out.append(v)
        return out, i
    if major == 5:  # map
        out = {}
        if info == 31:
            while b[i] != 0xFF:
                k, i = _decode(b, i)
                v, i = _decode(b, i)
                out[_key(k)] = v
            return out, i + 1
        n, i = _read_uint(b, i, info)
        for _ in range(n):
            k, i = _decode(b, i)
            v, i = _decode(b, i)
            out[_key(k)] = v
        return out, i
    if major == 6:  # tag: pass the tagged value through
        _, i = _read_uint(b, i, info)
        return _decode(b, i)
    # major 7: simple / float
    if info == 20:
        return False, i
    if info == 21:
        return True, i
    if info in (22, 23):  # null / undefined
        return None, i
    if info == 25:
        return _half_to_float(int.from_bytes(b[i : i + 2], "big")), i + 2
    if info == 26:
        return struct.unpack(">f", b[i : i + 4])[0], i + 4
    if info == 27:
        return struct.unpack(">d", b[i : i + 8])[0], i + 8
    if info < 24:
        return info, i  # unassigned simple value: its number
    if info == 24:
        return b[i], i + 1
    raise ValueError(f"unsupported major-7 info {info}")


def _key(k) -> str:
    if isinstance(k, str):
        return k
    if isinstance(k, bytes):
        return base64.b64encode(k).decode("ascii")
    return json.dumps(k, separators=(",", ":"))


def decode_cbor_py(payload: bytes, *, strict: bool = True):
    v, i = _decode(payload, 0)
    if strict and i != len(payload):
        raise ValueError(f"{len(payload) - i} trailing bytes")
    return v


def _head(major: int, n: int) -> bytes:
    if n < 24:
        return bytes([(major << 5) | n])
    if n < 256:
        return bytes([(major << 5) | 24, n])
    if n < 65536:
        return bytes([(major << 5) | 25]) + n.to_bytes(2, "big")
    if n < 2**32:
        return bytes([(major << 5) | 26]) + n.to_bytes(4, "big")
    return bytes([(major << 5) | 27]) + n.to_bytes(8, "big")


def encode_cbor_py(v) -> bytes:
    if v is None:
        return b"\xf6"
    if isinstance(v, bool):
        return b"\xf5" if v else b"\xf4"
    if isinstance(v, int):
        return _head(0, v) if v >= 0 else _head(1, -1 - v)
    if isinstance(v, float):
        return b"\xfb" + struct.pack(">d", v)
    if isinstance(v, bytes):
        return _head(2, len(v)) + v
    if isinstance(v, str):
        raw = v.encode("utf-8")
        return _head(3, len(raw)) + raw
    if isinstance(v, (list, tuple)):
        return _head(4, len(v)) + b"".join(encode_cbor_py(x) for x in v)
    if isinstance(v, dict):
        out = _head(5, len(v))
        for k, mv in v.items():
            out += encode_cbor_py(k) + encode_cbor_py(mv)
        return out
    raise ValueError(f"unencodable type {type(v).__name__}")


def _jsonable(v):
    if isinstance(v, bytes):
        return base64.b64encode(v).decode("ascii")
    if isinstance(v, list):
        return [_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, float) and (v != v or v in (float("inf"),
                                                  float("-inf"))):
        return None  # JSON has no NaN/Inf; error-channel-adjacent
    return v


def decode_cbor(col: Column) -> Column:
    """binary → JSON string of the decoded CBOR item (NULL on invalid
    — error-channel convention).  Arrow-batched."""

    @F.pandas_udf("string")
    def _dec(vals: pd.Series) -> pd.Series:
        def run(b):
            if b is None:
                return None
            try:
                return json.dumps(
                    _jsonable(decode_cbor_py(bytes(b))),
                    separators=(",", ":"), sort_keys=True,
                )
            except (ValueError, UnicodeDecodeError, IndexError):
                return None

        return vals.map(run)

    return _dec(col)


def encode_cbor(col: Column) -> Column:
    """JSON string → CBOR binary (the encoder seam; NULL stays NULL)."""

    @F.pandas_udf("binary")
    def _enc(vals: pd.Series) -> pd.Series:
        def run(s):
            if s is None:
                return None
            try:
                return encode_cbor_py(json.loads(s))
            except (ValueError, TypeError):
                return None

        return vals.map(run)

    return _enc(col)
