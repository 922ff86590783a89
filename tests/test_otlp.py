"""OTLP codec: wire-format round-trips, the reference's
signal-priority fallback, the typed LogRecord flatten, and config
acceptance.  Cross-checked against an INDEPENDENT test-side wire
encoder (raw struct/varint construction, not the module's encoder)."""

from __future__ import annotations

import json
import struct

import pytest

from vector_spark.sources.otlp import (
    DEFAULT_SIGNALS,
    decode_otlp,
    decode_otlp_py,
    encode_logs_request,
    otlp_log_records,
)

# --- independent wire construction helpers (test-side) ----------------


def vint(v: int) -> bytes:
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def tag(fno: int, wt: int) -> bytes:
    return vint((fno << 3) | wt)


def ld(fno: int, payload: bytes) -> bytes:
    return tag(fno, 2) + vint(len(payload)) + payload


def s(fno: int, text: str) -> bytes:
    return ld(fno, text.encode())


def kv_str(key: str, val: str) -> bytes:
    return ld(1, key.encode()) + ld(2, s(1, val))


LOGS_REQ = ld(
    1,  # resource_logs[0]
    ld(1, ld(1, kv_str("service.name", "checkout")))  # resource.attributes
    + ld(
        2,  # scope_logs[0]
        ld(1, s(1, "my.lib") + s(2, "1.2.0"))  # scope{name, version}
        + ld(
            2,  # log_records[0]
            tag(1, 1) + struct.pack("<Q", 1_700_000_000_000_000_000)
            + tag(2, 0) + vint(9)  # severity_number INFO
            + s(3, "INFO")
            + ld(5, s(1, "user logged in"))  # body stringValue
            + ld(6, kv_str("user.id", "u-42"))
            + ld(9, bytes.fromhex("0102030405060708090a0b0c0d0e0f10"))
            + ld(10, bytes.fromhex("1112131415161718"))
        )
        + ld(
            2,  # log_records[1] — int body, no trace context
            tag(1, 1) + struct.pack("<Q", 1_700_000_000_000_000_001)
            + ld(5, tag(3, 0) + vint(7))  # body intValue 7
        ),
    ),
)

METRICS_REQ = ld(
    1,  # resource_metrics[0]
    ld(1, ld(1, kv_str("service.name", "checkout")))
    + ld(
        2,  # scope_metrics[0]
        ld(1, s(1, "my.meter"))
        + ld(
            2,  # metrics[0]: gauge
            s(1, "cpu.load") + s(3, "1")
            + ld(
                5,
                ld(
                    1,
                    tag(3, 1) + struct.pack("<Q", 1_700_000_000_000_000_000)
                    + tag(4, 1) + struct.pack("<d", 0.75),
                ),
            ),
        ),
    ),
)

TRACES_REQ = ld(
    1,  # resource_spans[0]
    ld(
        2,  # scope_spans[0]
        ld(1, s(1, "my.tracer"))
        + ld(
            2,  # spans[0]
            ld(1, bytes.fromhex("0102030405060708090a0b0c0d0e0f10"))
            + ld(2, bytes.fromhex("1112131415161718"))
            + s(5, "GET /checkout")
            + tag(6, 0) + vint(2)  # kind SERVER
            + tag(7, 1) + struct.pack("<Q", 1_700_000_000_000_000_000)
            + tag(8, 1) + struct.pack("<Q", 1_700_000_000_100_000_000),
        ),
    ),
)


def test_logs_decode_shape():
    got = decode_otlp_py(LOGS_REQ)
    rl = got["resourceLogs"][0]
    assert rl["resource"]["attributes"][0] == {
        "key": "service.name", "value": {"stringValue": "checkout"},
    }
    sl = rl["scopeLogs"][0]
    assert sl["scope"] == {"name": "my.lib", "version": "1.2.0"}
    lr0, lr1 = sl["logRecords"]
    assert lr0["timeUnixNano"] == 1_700_000_000_000_000_000
    assert lr0["severityNumber"] == 9 and lr0["severityText"] == "INFO"
    assert lr0["body"] == {"stringValue": "user logged in"}
    assert lr0["traceId"] == "0102030405060708090a0b0c0d0e0f10"
    assert lr0["spanId"] == "1112131415161718"
    assert lr1["body"] == {"intValue": 7}
    assert "traceId" not in lr1


def test_signal_priority_fallback():
    """The reference's semantics: try logs -> metrics -> traces, accept
    the first that structurally parses.  Wire-type validation is what
    makes a metrics payload fall through the logs attempt."""
    m = decode_otlp_py(METRICS_REQ)
    assert "resourceMetrics" in m
    pts = m["resourceMetrics"][0]["scopeMetrics"][0]["metrics"][0]["gauge"][
        "dataPoints"
    ]
    assert pts[0]["asDouble"] == 0.75
    t = decode_otlp_py(TRACES_REQ)
    assert "resourceSpans" in t
    span = t["resourceSpans"][0]["scopeSpans"][0]["spans"][0]
    assert span["name"] == "GET /checkout" and span["kind"] == 2
    assert span["endTimeUnixNano"] - span["startTimeUnixNano"] == 100_000_000
    # explicit priority override, like the reference's signal_types
    only_traces = decode_otlp_py(TRACES_REQ, ("traces",))
    assert "resourceSpans" in only_traces
    with pytest.raises(ValueError, match="Invalid OTLP"):
        decode_otlp_py(b"\xff\xff\xff")
    with pytest.raises(ValueError, match="Invalid OTLP"):
        decode_otlp_py(b"")  # empty: no top-level field present


def test_encoder_roundtrip_and_cross_check():
    """module encoder -> module decoder round-trips; and the module
    encoder's bytes decode identically to the independent test-side
    construction of the same request."""
    req = decode_otlp_py(LOGS_REQ)
    enc = encode_logs_request(req)
    assert decode_otlp_py(enc) == req
    # nested value kinds round-trip too
    fancy = {
        "resourceLogs": [
            {
                "scopeLogs": [
                    {
                        "logRecords": [
                            {
                                "timeUnixNano": 1,
                                "body": {
                                    "kvlistValue": {
                                        "values": [
                                            {
                                                "key": "xs",
                                                "value": {
                                                    "arrayValue": {
                                                        "values": [
                                                            {"intValue": -3},
                                                            {"boolValue": True},
                                                            {"doubleValue": 1.5},
                                                        ]
                                                    }
                                                },
                                            }
                                        ]
                                    }
                                },
                            }
                        ]
                    }
                ]
            }
        ]
    }
    assert decode_otlp_py(encode_logs_request(fancy)) == fancy


def test_spark_flatten_and_decode(spark, tmp_path):
    d = tmp_path / "otlp"
    d.mkdir()
    (d / "req1.pb").write_bytes(LOGS_REQ)
    (d / "req2.pb").write_bytes(b"not a protobuf payload \xff")
    df = spark.read.format("binaryFile").load(str(d))
    rows = otlp_log_records(df).orderBy("time_unix_nano").collect()
    assert len(rows) == 2, "invalid payload yields no rows"
    r0 = rows[0]
    assert r0["resource_attributes"]["service.name"] == "checkout"
    assert r0["scope_name"] == "my.lib"
    assert r0["severity_text"] == "INFO"
    assert r0["body"] == "user logged in"
    assert r0["attributes"]["user.id"] == "u-42"
    assert r0["trace_id"] == "0102030405060708090a0b0c0d0e0f10"
    assert rows[1]["body"] == '{"intValue":7}'

    from pyspark.sql import functions as F

    dec = df.select(
        "path", decode_otlp(F.col("content")).alias("j")
    ).collect()
    by_path = {r["path"].rsplit("/", 1)[-1]: r["j"] for r in dec}
    assert by_path["req2.pb"] is None
    assert "resourceLogs" in json.loads(by_path["req1.pb"])


def test_config_accepts_otlp_source(spark, tmp_path):
    d = tmp_path / "otlp"
    d.mkdir()
    (d / "req.pb").write_bytes(LOGS_REQ)
    from vector_spark.config import build_topology

    out = build_topology(
        spark,
        {
            "sources": {
                "otel": {"type": "otlp", "path": str(d)},
                "otel_raw": {
                    "type": "otlp", "path": str(d), "flatten": False,
                    "signal_types": ["logs"],
                },
            },
        },
    )
    assert out["otel"].count() == 2
    raw = out["otel_raw"].collect()
    assert len(raw) == 1 and "resourceLogs" in raw[0]["decoded"]


def test_metric_histogram_exp_histogram_summary_decode():
    # HistogramDataPoint: count=10 (fixed64 f4), sum=55.5 (f5),
    # bucket_counts packed fixed64 (f6), explicit_bounds packed double
    # (f7), min/max (f11/f12)
    hist_pt = (
        tag(3, 1) + struct.pack("<Q", 2_000)            # time_unix_nano
        + tag(4, 1) + struct.pack("<Q", 10)             # count
        + tag(5, 1) + struct.pack("<d", 55.5)           # sum
        + ld(6, struct.pack("<3Q", 2, 5, 3))            # bucket_counts
        + ld(7, struct.pack("<2d", 1.0, 10.0))          # explicit_bounds
        + tag(11, 1) + struct.pack("<d", 0.5)           # min
        + tag(12, 1) + struct.pack("<d", 42.0)          # max
        + ld(9, kv_str("route", "/pay"))                # attributes
    )
    # ExponentialHistogramDataPoint: scale sint32=3 (f6 zigzag 6),
    # zero_count (f7), positive buckets {offset sint32=-2, counts
    # packed varint} (f8)
    exp_pt = (
        tag(4, 1) + struct.pack("<Q", 7)                # count
        + tag(6, 0) + vint(6)                           # scale = zigzag 3
        + tag(7, 1) + struct.pack("<Q", 1)              # zero_count
        + ld(8, tag(1, 0) + vint(3) + ld(2, vint(4) + vint(2)))
        # positive{offset=-2 (zigzag 3), bucket_counts=[4,2]}
    )
    # SummaryDataPoint: count f4, sum f5, quantile_values f6
    summ_pt = (
        tag(4, 1) + struct.pack("<Q", 100)
        + tag(5, 1) + struct.pack("<d", 250.0)
        + ld(6, tag(1, 1) + struct.pack("<d", 0.5)
              + tag(2, 1) + struct.pack("<d", 2.5))
        + ld(6, tag(1, 1) + struct.pack("<d", 0.99)
              + tag(2, 1) + struct.pack("<d", 9.9))
    )
    req = ld(
        1,
        ld(2,
           ld(2, s(1, "latency") + ld(9, ld(1, hist_pt) + tag(2, 0)
                                      + vint(2)))
           + ld(2, s(1, "latency_exp") + ld(10, ld(1, exp_pt)))
           + ld(2, s(1, "latency_sum") + ld(11, ld(1, summ_pt)))),
    )
    out = decode_otlp_py(req, ("metrics",))
    metrics = out["resourceMetrics"][0]["scopeMetrics"][0]["metrics"]
    by_name = {m["name"]: m for m in metrics}

    h = by_name["latency"]["histogram"]
    assert h["aggregationTemporality"] == 2
    pt = h["dataPoints"][0]
    assert pt["count"] == 10 and pt["sum"] == 55.5
    assert pt["bucketCounts"] == [2, 5, 3]
    assert pt["explicitBounds"] == [1.0, 10.0]
    assert pt["min"] == 0.5 and pt["max"] == 42.0
    assert pt["attributes"][0]["key"] == "route"

    e = by_name["latency_exp"]["exponentialHistogram"]["dataPoints"][0]
    assert e["count"] == 7 and e["scale"] == 3 and e["zeroCount"] == 1
    assert e["positive"] == {"offset": -2, "bucketCounts": [4, 2]}

    sm = by_name["latency_sum"]["summary"]["dataPoints"][0]
    assert sm["count"] == 100 and sm["sum"] == 250.0
    assert sm["quantileValues"] == [
        {"quantile": 0.5, "value": 2.5},
        {"quantile": 0.99, "value": 9.9},
    ]


def test_integer_gauge_asint_sfixed64():
    """Round-5 advice (high): `sfixed64 as_int = 6` is wire type I64
    (metrics.proto), not varint.  A spec-conformant integer gauge —
    tag(6, I64) + little-endian int64 — must decode, including
    negative values via two's complement."""
    def int_gauge(name: str, val: int) -> bytes:
        pt = (tag(3, 1) + struct.pack("<Q", 2_000)
              + tag(6, 1) + struct.pack("<q", val))  # as_int sfixed64
        return ld(2, s(1, name) + ld(5, ld(1, pt)))

    req = ld(1, ld(2, ld(1, s(1, "meter"))
                   + int_gauge("req.count", 42)
                   + int_gauge("temp.delta", -7)))
    m = decode_otlp_py(req)
    metrics = m["resourceMetrics"][0]["scopeMetrics"][0]["metrics"]
    pts = {mt["name"]: mt["gauge"]["dataPoints"][0] for mt in metrics}
    assert pts["req.count"]["asInt"] == 42
    assert pts["temp.delta"]["asInt"] == -7
    assert "asDouble" not in pts["req.count"]


def test_integer_sum_points_flatten(spark, tmp_path):
    """The `type: otlp` flatten path must surface integer counter
    values (the common real-world shape) — regression for the r5
    advice that every asInt payload raised 'Invalid OTLP data'."""
    from vector_spark.sources.otlp import otlp_metric_points

    sum_pt = (tag(3, 1) + struct.pack("<Q", 3_000)
              + tag(6, 1) + struct.pack("<q", 1234))
    # Sum{data_points=1, aggregation_temporality=2, is_monotonic=3}
    req = ld(1, ld(2, ld(1, s(1, "meter"))
                   + ld(2, s(1, "c")
                        + ld(7, ld(1, sum_pt)
                             + tag(2, 0) + vint(2)
                             + tag(3, 0) + vint(1)))))
    d = tmp_path / "metrics"
    d.mkdir()
    (d / "m.pb").write_bytes(req)
    pts = otlp_metric_points(
        spark.read.format("binaryFile").load(str(d)))
    rows = pts.collect()
    assert len(rows) == 1
    assert rows[0]["kind"] == "sum" and rows[0]["value"] == 1234.0


def test_otlp_metric_points_flatten(spark, tmp_path):
    from pyspark.sql import functions as F

    from vector_spark.sources.otlp import otlp_metric_points

    gauge_pt = (
        tag(3, 1) + struct.pack("<Q", 1_000)
        + tag(4, 1) + struct.pack("<d", 3.5)        # as_double
    )
    hist_pt = (
        tag(4, 1) + struct.pack("<Q", 6)
        + tag(5, 1) + struct.pack("<d", 12.0)
        + ld(6, struct.pack("<2Q", 4, 2))
        + ld(7, struct.pack("<1d", 5.0))
    )
    summ_pt = (
        tag(4, 1) + struct.pack("<Q", 9)
        + ld(6, tag(1, 1) + struct.pack("<d", 0.5)
              + tag(2, 1) + struct.pack("<d", 1.5))
    )
    req = ld(
        1,
        ld(1, ld(1, kv_str("service.name", "svc")))
        + ld(2,
             ld(1, s(1, "meter"))
             + ld(2, s(1, "g") + ld(5, ld(1, gauge_pt)))
             + ld(2, s(1, "h") + ld(9, ld(1, hist_pt)))
             + ld(2, s(1, "s") + ld(11, ld(1, summ_pt)))),
    )
    d = tmp_path / "metrics"
    d.mkdir()
    (d / "m.pb").write_bytes(req)
    df = spark.read.format("binaryFile").load(str(d))
    pts = otlp_metric_points(df)
    rows = {r["name"]: r for r in pts.collect()}
    assert set(rows) == {"g", "h", "s"}
    assert rows["g"]["kind"] == "gauge" and rows["g"]["value"] == 3.5
    assert rows["g"]["resource_attributes"]["service.name"] == "svc"
    assert rows["h"]["kind"] == "histogram"
    assert rows["h"]["bucket_counts"] == [4, 2]
    assert rows["h"]["explicit_bounds"] == [5.0]
    assert rows["s"]["kind"] == "summary"
    assert rows["s"]["quantiles"] == [0.5]
    assert rows["s"]["quantile_values"] == [1.5]
    # feeds the metric operators: windowless rollup over the points
    agg = pts.groupBy("kind").agg(F.count(F.lit(1)).alias("n")).collect()
    assert {(r["kind"], r["n"]) for r in agg} == {
        ("gauge", 1), ("histogram", 1), ("summary", 1)}


def test_otlp_spans_flatten(spark, tmp_path):
    from vector_spark.config import build_topology

    span = (
        ld(1, bytes.fromhex("00112233445566778899aabbccddeeff"))  # trace_id
        + ld(2, bytes.fromhex("0011223344556677"))                # span_id
        + ld(4, bytes.fromhex("8877665544332211"))                # parent
        + s(5, "GET /pay")
        + tag(6, 0) + vint(2)                                     # kind SERVER
        + tag(7, 1) + struct.pack("<Q", 1_000)
        + tag(8, 1) + struct.pack("<Q", 5_500)
        + ld(9, kv_str("http.status", "500"))
        + ld(15, s(2, "boom") + tag(3, 0) + vint(2))              # status ERROR
    )
    req = ld(1, ld(2, ld(1, s(1, "tracer")) + ld(2, span)))
    d = tmp_path / "traces"
    d.mkdir()
    (d / "t.pb").write_bytes(req)
    out = build_topology(spark, {"sources": {"tr": {
        "type": "otlp", "path": str(d), "signal_types": ["traces"]}}})
    rows = out["tr"].collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["trace_id"] == "00112233445566778899aabbccddeeff"
    assert r["parent_span_id"] == "8877665544332211"
    assert r["name"] == "GET /pay" and r["kind"] == 2
    assert r["duration_ns"] == 4_500
    assert r["attributes"]["http.status"] == "500"
    assert r["status_code"] == 2 and r["status_message"] == "boom"
    assert r["scope_name"] == "tracer"
