"""MMDB reader vs a spec-conformant fixture writer.

The writer below builds real MaxMind-DB-format files (search tree +
data section + metadata, record sizes 24 and 32) purely for test
fixtures; the reader under test
(vector_spark/enrich_mmdb.py) must decode them and feed
enrich_ip_ranges end-to-end."""

from __future__ import annotations

import ipaddress
import struct

import pytest

from vector_spark.enrich_mmdb import (
    MMDBReader,
    flatten_record,
    mmdb_range_table,
)

# ---------------------------------------------------------------------------
# fixture writer


def _enc(value) -> bytes:
    if isinstance(value, bool):
        return bytes([(0 << 5) | int(value), 14 - 7])
    if isinstance(value, str):
        b = value.encode()
        assert len(b) < 29
        return bytes([(2 << 5) | len(b)]) + b
    if isinstance(value, int):
        b = value.to_bytes((value.bit_length() + 7) // 8 or 1, "big")
        return bytes([(6 << 5) | len(b)]) + b
    if isinstance(value, float):
        return bytes([(3 << 5) | 8]) + struct.pack(">d", value)
    if isinstance(value, dict):
        out = bytes([(7 << 5) | len(value)])
        for k, v in value.items():
            out += _enc(k) + _enc(v)
        return out
    if isinstance(value, list):
        out = bytes([(0 << 5) | len(value), 11 - 7])
        for v in value:
            out += _enc(v)
        return out
    raise TypeError(type(value))


class _Node:
    __slots__ = ("left", "right")

    def __init__(self):
        self.left = None   # None | _Node | ("data", offset)
        self.right = None


def write_mmdb(path: str, networks: dict[str, dict], record_size: int = 32):
    """networks: cidr -> record dict; IPv4, ip_version=4."""
    # data section
    data = b""
    offsets: dict[str, int] = {}
    for cidr, rec in networks.items():
        offsets[cidr] = len(data)
        data += _enc(rec)

    # binary trie
    root = _Node()
    for cidr in networks:
        net = ipaddress.ip_network(cidr)
        node, bits = root, int(net.network_address)
        for i in range(net.prefixlen):
            side = (bits >> (31 - i)) & 1
            last = i == net.prefixlen - 1
            if last:
                leaf = ("data", offsets[cidr])
                if side:
                    node.right = leaf
                else:
                    node.left = leaf
            else:
                attr = "right" if side else "left"
                child = getattr(node, attr)
                if not isinstance(child, _Node):
                    child = _Node()
                    setattr(node, attr, child)
                node = child

    # number nodes breadth-first
    order: list[_Node] = []
    stack = [root]
    while stack:
        n = stack.pop(0)
        order.append(n)
        for child in (n.left, n.right):
            if isinstance(child, _Node):
                stack.append(child)
    index = {id(n): i for i, n in enumerate(order)}
    node_count = len(order)

    def record(child) -> int:
        if child is None:
            return node_count  # empty
        if isinstance(child, _Node):
            return index[id(child)]
        return node_count + 16 + child[1]  # data pointer

    tree = b""
    for n in order:
        left, right = record(n.left), record(n.right)
        if record_size == 32:
            tree += left.to_bytes(4, "big") + right.to_bytes(4, "big")
        elif record_size == 28:
            # spec layout: left low 3 bytes, then one byte holding
            # (left high nibble << 4) | right high nibble, then right
            # low 3 bytes
            assert left < (1 << 28) and right < (1 << 28)
            tree += (left & 0xFFFFFF).to_bytes(3, "big")
            tree += bytes([((left >> 24) << 4) | (right >> 24)])
            tree += (right & 0xFFFFFF).to_bytes(3, "big")
        elif record_size == 24:
            assert left < (1 << 24) and right < (1 << 24)
            tree += left.to_bytes(3, "big") + right.to_bytes(3, "big")
        else:
            raise ValueError(record_size)

    meta = {
        "binary_format_major_version": 2,
        "binary_format_minor_version": 0,
        "database_type": "Test-City",
        "ip_version": 4,
        "languages": ["en"],
        "node_count": node_count,
        "record_size": record_size,
    }
    blob = tree + b"\x00" * 16 + data
    blob += b"\xab\xcd\xefMaxMind.com" + _enc(meta)
    with open(path, "wb") as f:
        f.write(blob)


NETWORKS = {
    "10.0.0.0/8": {
        "country": {"iso_code": "AA", "names": {"en": "Alpha"}},
        "location": {"latitude": 1.5, "longitude": -3.25},
        "is_anycast": True,
    },
    "192.168.1.0/24": {
        "country": {"iso_code": "BB", "names": {"en": "Beta"}},
        "asn": 64512,
    },
    "203.0.113.0/24": {
        "country": {"iso_code": "CC", "names": {"en": "Gamma"}},
    },
}


@pytest.fixture(params=[32, 28, 24], ids=["rs32", "rs28", "rs24"])
def mmdb_path(request, tmp_path):
    p = str(tmp_path / "test.mmdb")
    write_mmdb(p, NETWORKS, record_size=request.param)
    return p


def test_metadata_and_point_lookup(mmdb_path):
    r = MMDBReader(mmdb_path)
    assert r.metadata["database_type"] == "Test-City"
    assert r.ip_version == 4

    hit = r.lookup("10.1.2.3")
    assert hit["country"]["iso_code"] == "AA"
    assert hit["location"]["latitude"] == 1.5
    assert hit["is_anycast"] is True
    assert r.lookup("192.168.1.200")["asn"] == 64512
    assert r.lookup("192.168.2.1") is None      # sibling /24 not present
    assert r.lookup("8.8.8.8") is None
    # boundary addresses of a range both hit
    assert r.lookup("203.0.113.0")["country"]["iso_code"] == "CC"
    assert r.lookup("203.0.113.255")["country"]["iso_code"] == "CC"


def test_networks_walk(mmdb_path):
    r = MMDBReader(mmdb_path)
    nets = sorted(r.networks())
    assert [(lo, hi) for lo, hi, _ in nets] == [
        (int(ipaddress.ip_address("10.0.0.0")),
         int(ipaddress.ip_address("10.255.255.255"))),
        (int(ipaddress.ip_address("192.168.1.0")),
         int(ipaddress.ip_address("192.168.1.255"))),
        (int(ipaddress.ip_address("203.0.113.0")),
         int(ipaddress.ip_address("203.0.113.255"))),
    ]
    assert nets[0][2]["country"]["iso_code"] == "AA"


def test_flatten_record():
    flat = flatten_record(NETWORKS["10.0.0.0/8"])
    assert flat["country.iso_code"] == "AA"
    assert flat["country.names.en"] == "Alpha"
    assert flat["location.latitude"] == 1.5
    assert flat["is_anycast"] is True


def test_range_table_feeds_enrich_ip_ranges(spark, mmdb_path):
    """The full geoip path: mmdb → range table → bucketed range join
    (the 100 TB plan; closes the enrichment-format gap)."""
    from pyspark.sql import functions as F

    from vector_spark.enrich import enrich_ip_ranges

    ranges = mmdb_range_table(spark, mmdb_path)
    assert {"ip_lo", "ip_hi", "country_iso_code"} <= set(ranges.columns)

    fact = spark.createDataFrame(
        [("e1", "10.9.9.9"), ("e2", "192.168.1.77"),
         ("e3", "198.51.100.1"), ("e4", "203.0.113.10")],
        "event string, client_ip string",
    )
    out = enrich_ip_ranges(
        fact, ranges.select("ip_lo", "ip_hi", "country_iso_code"),
        "client_ip",
    )
    got = {r["event"]: r["country_iso_code"] for r in out.collect()}
    assert got == {"e1": "AA", "e2": "BB", "e3": None, "e4": "CC"}


def test_range_table_handles_hyphenated_locale_keys(spark, tmp_path):
    """Real GeoLite2 records carry locale keys like names.zh-CN; the
    range-table schema must accept them (a DDL string rejects hyphens
    as unquoted identifiers).  Regression for the programmatic
    StructType schema."""
    p = str(tmp_path / "locale.mmdb")
    write_mmdb(p, {
        "10.0.0.0/8": {
            "country": {"iso_code": "AA",
                        "names": {"en": "Alpha", "zh-CN": "阿尔法",
                                  "pt-BR": "Alfa"}},
        },
    })
    tbl = mmdb_range_table(spark, p)
    assert "country_names_zh-CN" in tbl.columns
    [row] = tbl.collect()
    assert row["country_names_zh-CN"] == "阿尔法"
    assert row["country_names_pt-BR"] == "Alfa"


def test_range_table_with_no_attribute_keys(spark, tmp_path):
    """Records whose flattened attrs are empty (fields=[] selection)
    must still yield a valid (ip_lo, ip_hi) frame, not a schema parse
    error from a trailing comma."""
    p = str(tmp_path / "bare.mmdb")
    write_mmdb(p, {"10.0.0.0/8": {"country": {"iso_code": "AA"}}})
    tbl = mmdb_range_table(spark, p, fields=[])
    assert tbl.columns == ["ip_lo", "ip_hi"]
    assert tbl.count() == 1
