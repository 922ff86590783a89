"""Pure-Python MaxMind DB (.mmdb) reader feeding the range-join
enrichment path.

The reference reads MMDB files for geoip/asn enrichment
(/root/reference/src/enrichment_tables/geoip.rs,
/root/reference/src/enrichment_tables/mmdb.rs) via the maxminddb
crate.  The file format is a public spec (MaxMind DB File Format
Specification 2.0); this reader implements it directly — binary search
tree, data section with all 15 field types, pointer resolution, and
metadata — with two consumers:

- :meth:`MMDBReader.lookup` — single-IP point lookup (the VRL
  ``get_enrichment_table_record`` shape), driver-side.
- :func:`mmdb_range_table` — walk the whole tree into a DataFrame of
  ``(ip_lo, ip_hi, attributes...)`` rows feeding
  :func:`vector_spark.enrich.enrich_ip_ranges`, which is the
  distributed 100 TB path (bucketed range hash-join); the mmdb file is
  read ONCE at the driver, never per row.

IPv4 only for the range-table path (the transcript/event schemas carry
IPv4); IPv6 trees are readable but ``networks()`` yields only the
v4-mapped subtree.
"""

from __future__ import annotations

import ipaddress
import struct
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession

METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"

_POINTER, _STRING, _DOUBLE, _BYTES, _UINT16, _UINT32, _MAP = range(1, 8)
_EXT_INT32, _EXT_UINT64, _EXT_UINT128, _EXT_ARRAY = 8, 9, 10, 11
_EXT_CONTAINER, _EXT_END, _EXT_BOOL, _EXT_FLOAT = 12, 13, 14, 15


class MMDBError(ValueError):
    pass


class _Decoder:
    """Data-section decoder (spec §'Data Section')."""

    def __init__(self, buf: bytes, base: int):
        self.buf = buf
        self.base = base  # absolute offset where pointers are relative to

    def decode(self, offset: int) -> tuple[Any, int]:
        """-> (value, next_offset); offset is absolute in buf."""
        ctrl = self.buf[offset]
        offset += 1
        typ = ctrl >> 5
        if typ == 0:  # extended type
            typ = self.buf[offset] + 7
            offset += 1
        if typ == _POINTER:
            return self._pointer(ctrl, offset)
        size, offset = self._size(ctrl, offset)
        if typ == _STRING:
            return self.buf[offset : offset + size].decode("utf-8"), offset + size
        if typ == _DOUBLE:
            if size != 8:
                raise MMDBError("double must be 8 bytes")
            return struct.unpack(">d", self.buf[offset : offset + 8])[0], offset + 8
        if typ == _BYTES:
            return self.buf[offset : offset + size], offset + size
        if typ in (_UINT16, _UINT32, _EXT_UINT64, _EXT_UINT128):
            return int.from_bytes(self.buf[offset : offset + size], "big"), offset + size
        if typ == _EXT_INT32:
            return int.from_bytes(
                self.buf[offset : offset + size], "big", signed=True
            ), offset + size
        if typ == _MAP:
            out: dict = {}
            for _ in range(size):
                k, offset = self.decode(offset)
                v, offset = self.decode(offset)
                out[k] = v
            return out, offset
        if typ == _EXT_ARRAY:
            arr = []
            for _ in range(size):
                v, offset = self.decode(offset)
                arr.append(v)
            return arr, offset
        if typ == _EXT_BOOL:
            return bool(size), offset  # value lives in the size field
        if typ == _EXT_FLOAT:
            if size != 4:
                raise MMDBError("float must be 4 bytes")
            return struct.unpack(">f", self.buf[offset : offset + 4])[0], offset + 4
        if typ in (_EXT_CONTAINER, _EXT_END):
            raise MMDBError(f"unexpected type {typ} in data")
        raise MMDBError(f"unknown type {typ}")

    def _size(self, ctrl: int, offset: int) -> tuple[int, int]:
        size = ctrl & 0x1F
        if size < 29:
            return size, offset
        if size == 29:
            return 29 + self.buf[offset], offset + 1
        if size == 30:
            return 285 + int.from_bytes(self.buf[offset : offset + 2], "big"), offset + 2
        return 65821 + int.from_bytes(self.buf[offset : offset + 3], "big"), offset + 3

    def _pointer(self, ctrl: int, offset: int) -> tuple[Any, int]:
        psize = (ctrl >> 3) & 0x3
        v = ctrl & 0x7
        if psize == 0:
            p = (v << 8) | self.buf[offset]
            offset += 1
        elif psize == 1:
            p = ((v << 16) | int.from_bytes(self.buf[offset : offset + 2], "big")) + 2048
            offset += 2
        elif psize == 2:
            p = ((v << 24) | int.from_bytes(self.buf[offset : offset + 3], "big")) + 526336
            offset += 3
        else:
            p = int.from_bytes(self.buf[offset : offset + 4], "big")
            offset += 4
        value, _ = self.decode(self.base + p)
        return value, offset


class MMDBReader:
    """Minimal spec-complete reader: metadata, tree walk, point lookup."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            self.buf = f.read()
        idx = self.buf.rfind(METADATA_MARKER)
        if idx < 0:
            raise MMDBError("no MaxMind.com metadata marker found")
        meta_start = idx + len(METADATA_MARKER)
        self.metadata, _ = _Decoder(self.buf, meta_start).decode(meta_start)
        self.node_count = self.metadata["node_count"]
        self.record_size = self.metadata["record_size"]
        self.ip_version = self.metadata.get("ip_version", 6)
        if self.record_size not in (24, 28, 32):
            raise MMDBError(f"unsupported record_size {self.record_size}")
        self.node_bytes = self.record_size * 2 // 8
        self.tree_size = self.node_count * self.node_bytes
        # data section starts after the 16-byte separator; pointers are
        # relative to its start
        self.data_base = self.tree_size + 16
        self._decoder = _Decoder(self.buf, self.data_base)

    # -- tree ----------------------------------------------------------
    def _record(self, node: int, side: int) -> int:
        off = node * self.node_bytes
        if self.record_size == 24:
            o = off + side * 3
            return int.from_bytes(self.buf[o : o + 3], "big")
        if self.record_size == 28:
            middle = self.buf[off + 3]
            if side == 0:
                return (middle >> 4 << 24) | int.from_bytes(
                    self.buf[off : off + 3], "big"
                )
            return ((middle & 0x0F) << 24) | int.from_bytes(
                self.buf[off + 4 : off + 7], "big"
            )
        o = off + side * 4
        return int.from_bytes(self.buf[o : o + 4], "big")

    def _data_at(self, record: int) -> Any:
        # spec: record - node_count - 16 is the offset within the data
        # section, i.e. absolute tree_size + (record - node_count)
        offset = self.tree_size + (record - self.node_count)
        value, _ = self._decoder.decode(offset)
        return value

    def _v4_root(self) -> int:
        """Follow 96 zero bits in an IPv6 tree to the v4-mapped root."""
        node = 0
        if self.ip_version == 4:
            return node
        for _ in range(96):
            if node >= self.node_count:
                break
            node = self._record(node, 0)
        return node

    # -- public --------------------------------------------------------
    def lookup(self, ip: str) -> dict | None:
        addr = ipaddress.ip_address(ip)
        if addr.version == 4:
            bits, node = 32, self._v4_root()
        else:
            bits, node = 128, 0
            if self.ip_version == 4:
                raise MMDBError("IPv6 address in an IPv4-only database")
        val = int(addr)
        for i in range(bits - 1, -1, -1):
            if node >= self.node_count:
                break
            node = self._record(node, (val >> i) & 1)
        if node == self.node_count:
            return None
        if node > self.node_count:
            return self._data_at(node)
        return None

    def networks(self) -> Iterator[tuple[int, int, dict]]:
        """Yield (ip_lo, ip_hi, record) for every IPv4 network —
        iterative DFS over the search tree (depth ≤ 32)."""
        root = self._v4_root()
        if root >= self.node_count:
            return
        stack: list[tuple[int, int, int]] = [(root, 0, 0)]  # node, prefix, depth
        while stack:
            node, prefix, depth = stack.pop()
            for side in (1, 0):
                rec = self._record(node, side)
                child_prefix = prefix | (side << (31 - depth))
                if rec == self.node_count:
                    continue  # empty branch
                if rec > self.node_count:
                    lo = child_prefix
                    hi = child_prefix | ((1 << (31 - depth)) - 1)
                    yield lo, hi, self._data_at(rec)
                elif depth < 31:
                    stack.append((rec, child_prefix, depth + 1))


def flatten_record(rec: dict, prefix: str = "") -> dict[str, Any]:
    """geoip.rs-style flattening: nested maps become dot-joined keys;
    arrays keep their first element (the reference selects
    single-language names); scalars pass through."""
    out: dict[str, Any] = {}
    for k, v in rec.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(flatten_record(v, key + "."))
        elif isinstance(v, list):
            if v and not isinstance(v[0], (dict, list)):
                out[key] = v[0]
        else:
            out[key] = v
    return out


def mmdb_range_table(
    spark: SparkSession,
    path: str,
    fields: list[str] | None = None,
) -> DataFrame:
    """Read the whole .mmdb tree (driver-side, once) into a
    ``(ip_lo, ip_hi, <flattened attribute columns>)`` DataFrame for
    :func:`vector_spark.enrich.enrich_ip_ranges` — the distributed
    range-join replaces per-row point lookups at scale."""
    reader = MMDBReader(path)
    rows = []
    # fields=None → discover every key in the db; fields=[] → no
    # attribute columns (just the ip range)
    keys: list[str] = list(fields) if fields is not None else []
    flat_records = [
        (lo, hi, flatten_record(rec)) for lo, hi, rec in reader.networks()
    ]
    if fields is None:
        seen: dict[str, None] = {}
        for _, _, flat in flat_records:
            for k in flat:
                seen.setdefault(k, None)
        keys = list(seen)
    for lo, hi, flat in flat_records:
        rows.append(
            (lo, hi, *[None if flat.get(k) is None else str(flat[k]) for k in keys])
        )
    # programmatic StructType, NOT a DDL string: real GeoLite2 keys
    # contain hyphens (country.names.zh-CN) that DDL rejects as
    # unquoted identifiers, and zero attribute keys must still yield a
    # valid two-column schema
    from pyspark.sql import types as T

    attr_cols = [k.replace(".", "_") for k in keys]
    schema = T.StructType(
        [
            T.StructField("ip_lo", T.LongType()),
            T.StructField("ip_hi", T.LongType()),
            *[T.StructField(c, T.StringType()) for c in attr_cols],
        ]
    )
    return spark.createDataFrame(rows, schema)
