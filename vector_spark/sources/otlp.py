"""OTLP (OpenTelemetry protocol) codec — a pure-Python protobuf
wire-format decoder/encoder for the three OTLP export request types,
mirroring the reference's otlp codec behavior
(/root/reference/lib/codecs/src/decoding/format/otlp.rs: try signal
types in priority order — logs, then metrics, then traces — and accept
the first whose top-level field is present;
/root/reference/lib/codecs/src/encoding/format/otlp.rs: the inverse).

Like the round-3 MMDB reader, this avoids any jar/package dependency:
the protobuf wire format (varint / 64-bit / length-delimited / 32-bit
fields) and the OTLP message schemas are public specs, and the subset
needed for logs, spans, and gauge/sum metrics is small.  Field names
follow the protobuf JSON mapping (camelCase — the reference passes
``use_json_names: true``), with trace/span ids rendered lowercase hex
per the OTLP/JSON encoding.

Spark surfaces:
- :func:`decode_otlp` — binary column -> JSON string of the decoded
  request (schemaless, matching the reference's ``Kind::any`` output);
  Arrow-batched pandas UDF.
- :func:`otlp_log_records` — binary requests -> one typed row per
  LogRecord (resource attributes, scope, body, severity, timestamps,
  trace/span ids) via ``mapInPandas`` — the LogRecord-to-transcripts
  mapping for the pipeline operators.
- config: source ``type: otlp`` (config.py) reads binary files and
  applies either surface.

Unknown fields are skipped (standard proto semantics), so payloads
from newer OTLP versions degrade gracefully instead of failing.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, MapType, StringType, StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# protobuf wire primitives

_VARINT, _I64, _LEN, _I32 = 0, 1, 2, 5


def _read_varint(b: bytes, i: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        if i >= len(b):
            raise ValueError("truncated varint")
        byte = b[i]
        out |= (byte & 0x7F) << shift
        i += 1
        if not byte & 0x80:
            return out, i
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _write_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        bits = v & 0x7F
        v >>= 7
        if v:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def _fields(b: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_no, wire_type, raw value) over a message's bytes;
    length-delimited values come back as bytes slices."""
    i = 0
    n = len(b)
    while i < n:
        key, i = _read_varint(b, i)
        fno, wt = key >> 3, key & 7
        if wt == _VARINT:
            v, i = _read_varint(b, i)
        elif wt == _I64:
            if i + 8 > n:
                raise ValueError("truncated fixed64")
            v = int.from_bytes(b[i : i + 8], "little")
            i += 8
        elif wt == _LEN:
            ln, i = _read_varint(b, i)
            if i + ln > n:
                raise ValueError("truncated length-delimited field")
            v = b[i : i + ln]
            i += ln
        elif wt == _I32:
            if i + 4 > n:
                raise ValueError("truncated fixed32")
            v = int.from_bytes(b[i : i + 4], "little")
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, v


def _expect(wt: int, want: int, where: str) -> None:
    """Wire-type validation — what the reference gets from its prost
    descriptors: a payload decoded under the wrong signal's schema hits
    a mismatched wire type and the decode falls through to the next
    signal in priority order."""
    if wt != want:
        raise ValueError(f"wire type {wt} != {want} at {where}")


# ---------------------------------------------------------------------------
# OTLP message subset (public schema: opentelemetry-proto)


def _any_value(b: bytes) -> dict:
    """AnyValue — the oneof keeps its JSON field name, matching the
    protobuf JSON mapping the reference emits."""
    for fno, _wt, v in _fields(b):
        if fno == 1:
            return {"stringValue": v.decode("utf-8", errors="replace")}
        if fno == 2:
            return {"boolValue": bool(v)}
        if fno == 3:
            return {"intValue": _signed(v)}
        if fno == 4:
            return {"doubleValue": _f64(v)}
        if fno == 5:  # ArrayValue{repeated AnyValue values = 1}
            return {
                "arrayValue": {
                    "values": [
                        _any_value(x)
                        for f, _w, x in _fields(v)
                        if f == 1
                    ]
                }
            }
        if fno == 6:  # KeyValueList{repeated KeyValue values = 1}
            return {
                "kvlistValue": {
                    "values": [
                        _key_value(x)
                        for f, _w, x in _fields(v)
                        if f == 1
                    ]
                }
            }
        if fno == 7:
            import base64

            return {"bytesValue": base64.b64encode(v).decode("ascii")}
    return {}


def _signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _f64(v: int) -> float:
    import struct

    return struct.unpack("<d", v.to_bytes(8, "little"))[0]


def _key_value(b: bytes) -> dict:
    out: dict = {"key": "", "value": {}}
    for fno, wt, v in _fields(b):
        if fno == 1:
            _expect(wt, _LEN, "KeyValue.key")
            out["key"] = v.decode("utf-8", errors="replace")
        elif fno == 2:
            _expect(wt, _LEN, "KeyValue.value")
            out["value"] = _any_value(v)
    return out


def _scope(b: bytes) -> dict:
    out: dict = {}
    for fno, _wt, v in _fields(b):
        if fno == 1:
            out["name"] = v.decode("utf-8", errors="replace")
        elif fno == 2:
            out["version"] = v.decode("utf-8", errors="replace")
        elif fno == 3:
            out.setdefault("attributes", []).append(_key_value(v))
    return out


def _resource(b: bytes) -> dict:
    out: dict = {}
    for fno, _wt, v in _fields(b):
        if fno == 1:
            out.setdefault("attributes", []).append(_key_value(v))
        elif fno == 2:
            out["droppedAttributesCount"] = v
    return out


def _log_record(b: bytes) -> dict:
    out: dict = {}
    for fno, wt, v in _fields(b):
        if fno == 1:
            _expect(wt, _I64, "LogRecord.time_unix_nano")
            out["timeUnixNano"] = v
        elif fno == 11:
            _expect(wt, _I64, "LogRecord.observed_time_unix_nano")
            out["observedTimeUnixNano"] = v
        elif fno == 2:
            _expect(wt, _VARINT, "LogRecord.severity_number")
            out["severityNumber"] = v
        elif fno == 3:
            _expect(wt, _LEN, "LogRecord.severity_text")
            out["severityText"] = v.decode("utf-8", errors="replace")
        elif fno == 5:
            _expect(wt, _LEN, "LogRecord.body")
            out["body"] = _any_value(v)
        elif fno == 6:
            _expect(wt, _LEN, "LogRecord.attributes")
            out.setdefault("attributes", []).append(_key_value(v))
        elif fno == 7:
            _expect(wt, _VARINT, "LogRecord.dropped_attributes_count")
            out["droppedAttributesCount"] = v
        elif fno == 8:
            _expect(wt, _I32, "LogRecord.flags")
            out["flags"] = v
        elif fno == 9:
            _expect(wt, _LEN, "LogRecord.trace_id")
            out["traceId"] = v.hex()
        elif fno == 10:
            _expect(wt, _LEN, "LogRecord.span_id")
            out["spanId"] = v.hex()
        elif fno == 12:
            _expect(wt, _LEN, "LogRecord.event_name")
            out["eventName"] = v.decode("utf-8", errors="replace")
    return out


def _span(b: bytes) -> dict:
    out: dict = {}
    for fno, wt, v in _fields(b):
        if fno == 1:
            _expect(wt, _LEN, "Span.trace_id")
            out["traceId"] = v.hex()
        elif fno == 2:
            _expect(wt, _LEN, "Span.span_id")
            out["spanId"] = v.hex()
        elif fno == 4:
            _expect(wt, _LEN, "Span.parent_span_id")
            out["parentSpanId"] = v.hex()
        elif fno == 5:
            _expect(wt, _LEN, "Span.name")
            out["name"] = v.decode("utf-8", errors="replace")
        elif fno == 6:
            _expect(wt, _VARINT, "Span.kind")
            out["kind"] = v
        elif fno == 7:
            _expect(wt, _I64, "Span.start_time_unix_nano")
            out["startTimeUnixNano"] = v
        elif fno == 8:
            _expect(wt, _I64, "Span.end_time_unix_nano")
            out["endTimeUnixNano"] = v
        elif fno == 9:
            _expect(wt, _LEN, "Span.attributes")
            out.setdefault("attributes", []).append(_key_value(v))
        elif fno == 15:
            _expect(wt, _LEN, "Span.status")  # Status{message=2, code=3}
            st: dict = {}
            for f2, _w2, v2 in _fields(v):
                if f2 == 2:
                    st["message"] = v2.decode("utf-8", errors="replace")
                elif f2 == 3:
                    st["code"] = v2
            out["status"] = st
    return out


def _number_point(b: bytes) -> dict:
    out: dict = {}
    for fno, wt, v in _fields(b):
        if fno == 7:
            _expect(wt, _LEN, "NumberDataPoint.attributes")
            out.setdefault("attributes", []).append(_key_value(v))
        elif fno == 2:
            _expect(wt, _I64, "NumberDataPoint.start_time_unix_nano")
            out["startTimeUnixNano"] = v
        elif fno == 3:
            _expect(wt, _I64, "NumberDataPoint.time_unix_nano")
            out["timeUnixNano"] = v
        elif fno == 4:
            _expect(wt, _I64, "NumberDataPoint.as_double")
            out["asDouble"] = _f64(v)
        elif fno == 6:
            # `sfixed64 as_int = 6` (metrics.proto) — wire type I64,
            # NOT varint; raw little-endian two's complement
            _expect(wt, _I64, "NumberDataPoint.as_int")
            out["asInt"] = _signed(v)
    return out


def _packed_fixed64(v: bytes) -> list[int]:
    if len(v) % 8:
        raise ValueError("packed fixed64 length not multiple of 8")
    return [int.from_bytes(v[i : i + 8], "little")
            for i in range(0, len(v), 8)]


def _packed_doubles(v: bytes) -> list[float]:
    import struct

    if len(v) % 8:
        raise ValueError("packed double length not multiple of 8")
    return list(struct.unpack(f"<{len(v) // 8}d", v))


def _packed_varints(v: bytes) -> list[int]:
    out = []
    i = 0
    while i < len(v):
        x, i = _read_varint(v, i)
        out.append(x)
    return out


def _unzig32(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _histogram_point(b: bytes) -> dict:
    """HistogramDataPoint (metrics.proto): explicit-bounds histogram —
    the OTel shape the reference maps onto AggregatedHistogram."""
    out: dict = {}
    for fno, wt, v in _fields(b):
        if fno == 9:
            _expect(wt, _LEN, "HistogramDataPoint.attributes")
            out.setdefault("attributes", []).append(_key_value(v))
        elif fno == 2:
            out["startTimeUnixNano"] = v
        elif fno == 3:
            out["timeUnixNano"] = v
        elif fno == 4:
            out["count"] = v
        elif fno == 5:
            out["sum"] = _f64(v)
        elif fno == 6:  # repeated fixed64, packed
            _expect(wt, _LEN, "HistogramDataPoint.bucket_counts")
            out["bucketCounts"] = _packed_fixed64(v)
        elif fno == 7:  # repeated double, packed
            _expect(wt, _LEN, "HistogramDataPoint.explicit_bounds")
            out["explicitBounds"] = _packed_doubles(v)
        elif fno == 11:
            out["min"] = _f64(v)
        elif fno == 12:
            out["max"] = _f64(v)
    return out


def _exp_buckets(b: bytes) -> dict:
    out: dict = {"offset": 0, "bucketCounts": []}
    for fno, wt, v in _fields(b):
        if fno == 1:
            out["offset"] = _unzig32(v)
        elif fno == 2:
            if wt == _LEN:  # packed uint64 varints
                out["bucketCounts"].extend(_packed_varints(v))
            else:
                out["bucketCounts"].append(v)
    return out


def _exp_histogram_point(b: bytes) -> dict:
    """ExponentialHistogramDataPoint: base-2 exponential buckets
    (scale, zero_count, positive/negative offset+counts)."""
    out: dict = {}
    for fno, wt, v in _fields(b):
        if fno == 1:
            _expect(wt, _LEN, "ExpHistogramDataPoint.attributes")
            out.setdefault("attributes", []).append(_key_value(v))
        elif fno == 2:
            out["startTimeUnixNano"] = v
        elif fno == 3:
            out["timeUnixNano"] = v
        elif fno == 4:
            out["count"] = v
        elif fno == 5:
            out["sum"] = _f64(v)
        elif fno == 6:
            out["scale"] = _unzig32(v)
        elif fno == 7:
            out["zeroCount"] = v
        elif fno == 8:
            _expect(wt, _LEN, "ExpHistogramDataPoint.positive")
            out["positive"] = _exp_buckets(v)
        elif fno == 9:
            _expect(wt, _LEN, "ExpHistogramDataPoint.negative")
            out["negative"] = _exp_buckets(v)
        elif fno == 12:
            out["min"] = _f64(v)
        elif fno == 13:
            out["max"] = _f64(v)
    return out


def _summary_point(b: bytes) -> dict:
    """SummaryDataPoint: pre-aggregated quantiles — the OTel shape the
    reference maps onto AggregatedSummary."""
    out: dict = {}
    for fno, wt, v in _fields(b):
        if fno == 7:
            _expect(wt, _LEN, "SummaryDataPoint.attributes")
            out.setdefault("attributes", []).append(_key_value(v))
        elif fno == 2:
            out["startTimeUnixNano"] = v
        elif fno == 3:
            out["timeUnixNano"] = v
        elif fno == 4:
            out["count"] = v
        elif fno == 5:
            out["sum"] = _f64(v)
        elif fno == 6:  # ValueAtQuantile{quantile=1 double, value=2 double}
            _expect(wt, _LEN, "SummaryDataPoint.quantile_values")
            q: dict = {}
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    q["quantile"] = _f64(v2)
                elif f2 == 2:
                    q["value"] = _f64(v2)
            out.setdefault("quantileValues", []).append(q)
    return out


def _metric(b: bytes) -> dict:
    out: dict = {}
    for fno, wt, v in _fields(b):
        if fno == 1:
            _expect(wt, _LEN, "Metric.name")
            out["name"] = v.decode("utf-8", errors="replace")
        elif fno == 2:
            _expect(wt, _LEN, "Metric.description")
            out["description"] = v.decode("utf-8", errors="replace")
        elif fno == 3:
            _expect(wt, _LEN, "Metric.unit")
            out["unit"] = v.decode("utf-8", errors="replace")
        elif fno == 5:
            _expect(wt, _LEN, "Metric.gauge")  # Gauge{repeated NumberDataPoint = 1}
            out["gauge"] = {
                "dataPoints": [
                    _number_point(x) for f, _w, x in _fields(v) if f == 1
                ]
            }
        elif fno == 7:  # Sum{points=1, aggregation_temporality=2, monotonic=3}
            _expect(wt, _LEN, "Metric.sum")
            s: dict = {"dataPoints": []}
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    s["dataPoints"].append(_number_point(v2))
                elif f2 == 2:
                    s["aggregationTemporality"] = v2
                elif f2 == 3:
                    s["isMonotonic"] = bool(v2)
            out["sum"] = s
        elif fno == 9:  # Histogram{points=1, aggregation_temporality=2}
            _expect(wt, _LEN, "Metric.histogram")
            h: dict = {"dataPoints": []}
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    h["dataPoints"].append(_histogram_point(v2))
                elif f2 == 2:
                    h["aggregationTemporality"] = v2
            out["histogram"] = h
        elif fno == 10:  # ExponentialHistogram{points=1, temporality=2}
            _expect(wt, _LEN, "Metric.exponential_histogram")
            eh: dict = {"dataPoints": []}
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    eh["dataPoints"].append(_exp_histogram_point(v2))
                elif f2 == 2:
                    eh["aggregationTemporality"] = v2
            out["exponentialHistogram"] = eh
        elif fno == 11:  # Summary{points=1}
            _expect(wt, _LEN, "Metric.summary")
            sm: dict = {"dataPoints": []}
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    sm["dataPoints"].append(_summary_point(v2))
            out["summary"] = sm
    return out


def _grouped(b: bytes, scope_field: int, item_field: int, item_fn) -> dict:
    """ResourceLogs / ResourceSpans / ResourceMetrics share one shape:
    resource=1, repeated scope-group=2{scope=1, repeated item, schema
    url}, schema_url=3."""
    out: dict = {}
    groups = []
    for fno, wt, v in _fields(b):
        if fno == 1:
            _expect(wt, _LEN, "Resource*.resource")
            out["resource"] = _resource(v)
        elif fno == 2:
            _expect(wt, _LEN, "Resource*.scope group")
            g: dict = {}
            items = []
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    g["scope"] = _scope(v2)
                elif f2 == item_field:
                    items.append(item_fn(v2))
                elif f2 == 3:
                    g["schemaUrl"] = v2.decode("utf-8", errors="replace")
            g[_ITEM_NAMES[scope_field]] = items
            groups.append(g)
        elif fno == 3:
            out["schemaUrl"] = v.decode("utf-8", errors="replace")
    out[_GROUP_NAMES[scope_field]] = groups
    return out


_ITEM_NAMES = {0: "logRecords", 1: "spans", 2: "metrics"}
_GROUP_NAMES = {0: "scopeLogs", 1: "scopeSpans", 2: "scopeMetrics"}
_ITEM_FIELDS = {0: 2, 1: 2, 2: 2}
_ITEM_FNS = {0: _log_record, 1: _span, 2: _metric}
_TOP_NAMES = {0: "resourceLogs", 1: "resourceSpans", 2: "resourceMetrics"}
_SIGNAL_IDX = {"logs": 0, "traces": 1, "metrics": 2}

#: the reference's default priority order (otlp.rs default_signal_types)
DEFAULT_SIGNALS = ("logs", "metrics", "traces")


def decode_otlp_py(
    b: bytes, signals: tuple[str, ...] = DEFAULT_SIGNALS
) -> dict:
    """Decode one OTLP export request, trying ``signals`` in priority
    order and accepting the first that parses with a non-empty
    top-level field — the reference's exact fallback semantics.
    Raises ValueError when nothing matches."""
    for sig in signals:
        idx = _SIGNAL_IDX[sig]
        try:
            tops = [
                _grouped(v, idx, _ITEM_FIELDS[idx], _ITEM_FNS[idx])
                for fno, _wt, v in _fields(b)
                if fno == 1
            ]
        except (ValueError, KeyError):
            continue
        if tops:
            return {_TOP_NAMES[idx]: tops}
    raise ValueError(f"Invalid OTLP data: expected one of {list(signals)}")


# ---------------------------------------------------------------------------
# encoder (the encoding/format/otlp.rs inverse; used by sinks + tests)


def _tag(fno: int, wt: int) -> bytes:
    return _write_varint((fno << 3) | wt)


def _len_field(fno: int, payload: bytes) -> bytes:
    return _tag(fno, _LEN) + _write_varint(len(payload)) + payload


def _enc_any(v: dict) -> bytes:
    if "stringValue" in v:
        return _len_field(1, v["stringValue"].encode("utf-8"))
    if "boolValue" in v:
        return _tag(2, _VARINT) + _write_varint(1 if v["boolValue"] else 0)
    if "intValue" in v:
        iv = int(v["intValue"])
        return _tag(3, _VARINT) + _write_varint(iv & ((1 << 64) - 1))
    if "doubleValue" in v:
        import struct

        return _tag(4, _I64) + struct.pack("<d", float(v["doubleValue"]))
    if "arrayValue" in v:
        inner = b"".join(
            _len_field(1, _enc_any(x))
            for x in v["arrayValue"].get("values", [])
        )
        return _len_field(5, inner)
    if "kvlistValue" in v:
        inner = b"".join(
            _len_field(1, _enc_kv(x))
            for x in v["kvlistValue"].get("values", [])
        )
        return _len_field(6, inner)
    if "bytesValue" in v:
        import base64

        return _len_field(7, base64.b64decode(v["bytesValue"]))
    return b""


def _enc_kv(kv: dict) -> bytes:
    return _len_field(1, kv.get("key", "").encode("utf-8")) + _len_field(
        2, _enc_any(kv.get("value", {}))
    )


def _enc_resource(r: dict) -> bytes:
    return b"".join(
        _len_field(1, _enc_kv(kv)) for kv in r.get("attributes", [])
    )


def _enc_log_record(lr: dict) -> bytes:
    out = bytearray()
    if "timeUnixNano" in lr:
        out += _tag(1, _I64) + int(lr["timeUnixNano"]).to_bytes(8, "little")
    if "observedTimeUnixNano" in lr:
        out += _tag(11, _I64) + int(lr["observedTimeUnixNano"]).to_bytes(
            8, "little"
        )
    if "severityNumber" in lr:
        out += _tag(2, _VARINT) + _write_varint(int(lr["severityNumber"]))
    if "severityText" in lr:
        out += _len_field(3, lr["severityText"].encode("utf-8"))
    if "body" in lr:
        out += _len_field(5, _enc_any(lr["body"]))
    for kv in lr.get("attributes", []):
        out += _len_field(6, _enc_kv(kv))
    if "flags" in lr:
        out += _tag(8, _I32) + int(lr["flags"]).to_bytes(4, "little")
    if "traceId" in lr:
        out += _len_field(9, bytes.fromhex(lr["traceId"]))
    if "spanId" in lr:
        out += _len_field(10, bytes.fromhex(lr["spanId"]))
    if "eventName" in lr:
        out += _len_field(12, lr["eventName"].encode("utf-8"))
    return bytes(out)


def encode_logs_request(req: dict) -> bytes:
    """ExportLogsServiceRequest dict (JSON field names, the decoder's
    output shape) -> protobuf wire bytes."""
    out = bytearray()
    for rl in req.get("resourceLogs", []):
        body = bytearray()
        if "resource" in rl:
            body += _len_field(1, _enc_resource(rl["resource"]))
        for sl in rl.get("scopeLogs", []):
            sbody = bytearray()
            if "scope" in sl:
                sc = sl["scope"]
                scope_b = _len_field(1, sc.get("name", "").encode("utf-8"))
                if sc.get("version"):
                    scope_b += _len_field(
                        2, sc["version"].encode("utf-8")
                    )
                sbody += _len_field(1, scope_b)
            for lr in sl.get("logRecords", []):
                sbody += _len_field(2, _enc_log_record(lr))
            if sl.get("schemaUrl"):
                sbody += _len_field(3, sl["schemaUrl"].encode("utf-8"))
            body += _len_field(2, bytes(sbody))
        if rl.get("schemaUrl"):
            body += _len_field(3, rl["schemaUrl"].encode("utf-8"))
        out += _len_field(1, bytes(body))
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark surfaces


def decode_otlp(
    col: Column, signals: tuple[str, ...] = DEFAULT_SIGNALS
) -> Column:
    """binary -> JSON string of the decoded request (NULL on invalid
    payloads — the error-channel convention; schemaless, matching the
    reference codec's any-shaped output)."""

    @F.pandas_udf("string")
    def _dec(vals: pd.Series) -> pd.Series:
        def run(b):
            if b is None:
                return None
            try:
                return json.dumps(
                    decode_otlp_py(bytes(b), signals),
                    separators=(",", ":"),
                    sort_keys=True,
                )
            except ValueError:
                return None

        return vals.map(run)

    return _dec(col)


#: flattened LogRecord schema — the transcripts-shaped mapping
LOG_RECORD_SCHEMA = StructType(
    [
        StructField("resource_attributes", MapType(StringType(), StringType())),
        StructField("scope_name", StringType()),
        StructField("time_unix_nano", LongType()),
        StructField("observed_time_unix_nano", LongType()),
        StructField("severity_number", LongType()),
        StructField("severity_text", StringType()),
        StructField("body", StringType()),
        StructField("attributes", MapType(StringType(), StringType())),
        StructField("trace_id", StringType()),
        StructField("span_id", StringType()),
        StructField("event_name", StringType()),
    ]
)


def _attr_map(kvs: list[dict]) -> dict:
    """Attribute list -> string map (scalar values stringified; nested
    values as compact JSON) — the lookup-friendly shape the enrich /
    route operators key on."""
    out = {}
    for kv in kvs or []:
        v = kv.get("value", {})
        if "stringValue" in v:
            out[kv["key"]] = v["stringValue"]
        elif len(v) == 1:
            out[kv["key"]] = json.dumps(
                next(iter(v.values())), separators=(",", ":"), sort_keys=True
            )
        else:
            out[kv["key"]] = ""
    return out


def otlp_log_records(
    df: DataFrame, *, value_col: str = "content"
) -> DataFrame:
    """Explode binary ExportLogsServiceRequest payloads into one typed
    row per LogRecord (``LOG_RECORD_SCHEMA``) via ``mapInPandas`` —
    Arrow-batched, no per-row Python UDF calls, partition-parallel.
    Invalid payloads yield no rows (the dropped-channel convention —
    count inputs vs outputs to meter them)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[value_col]:
                if b is None:
                    continue
                try:
                    req = decode_otlp_py(bytes(b), ("logs",))
                except ValueError:
                    continue
                for rl in req.get("resourceLogs", []):
                    res_attrs = _attr_map(
                        rl.get("resource", {}).get("attributes")
                    )
                    for sl in rl.get("scopeLogs", []):
                        scope = sl.get("scope", {}).get("name")
                        for lr in sl.get("logRecords", []):
                            body = lr.get("body", {})
                            rows.append(
                                {
                                    "resource_attributes": res_attrs,
                                    "scope_name": scope,
                                    "time_unix_nano": lr.get("timeUnixNano"),
                                    "observed_time_unix_nano": lr.get(
                                        "observedTimeUnixNano"
                                    ),
                                    "severity_number": lr.get(
                                        "severityNumber"
                                    ),
                                    "severity_text": lr.get("severityText"),
                                    "body": body.get("stringValue")
                                    if "stringValue" in body
                                    else (
                                        json.dumps(
                                            body,
                                            separators=(",", ":"),
                                            sort_keys=True,
                                        )
                                        if body
                                        else None
                                    ),
                                    "attributes": _attr_map(
                                        lr.get("attributes")
                                    ),
                                    "trace_id": lr.get("traceId"),
                                    "span_id": lr.get("spanId"),
                                    "event_name": lr.get("eventName"),
                                }
                            )
            yield pd.DataFrame(
                rows, columns=[f.name for f in LOG_RECORD_SCHEMA.fields]
            )

    return df.mapInPandas(gen, LOG_RECORD_SCHEMA)


#: flattened metric data-point schema — one row per point, every OTel
#: metric kind (gauge/sum/histogram/exponential_histogram/summary) in
#: the shape the metric operators consume (aggregate.py histogram /
#: quantile modes, log_to_metric/metric_to_log)
METRIC_POINT_SCHEMA = StructType(
    [
        StructField("resource_attributes",
                    MapType(StringType(), StringType())),
        StructField("scope_name", StringType()),
        StructField("name", StringType()),
        StructField("unit", StringType()),
        StructField("kind", StringType()),
        StructField("time_unix_nano", LongType()),
        StructField("attributes", MapType(StringType(), StringType())),
        StructField("value", DoubleType()),          # gauge/sum points
        StructField("count", LongType()),            # histo/exp/summary
        StructField("sum", DoubleType()),
        StructField("bucket_counts", ArrayType(LongType())),
        StructField("explicit_bounds", ArrayType(DoubleType())),
        StructField("scale", LongType()),            # exp histogram
        StructField("zero_count", LongType()),
        StructField("positive_offset", LongType()),
        StructField("positive_counts", ArrayType(LongType())),
        StructField("quantiles", ArrayType(DoubleType())),  # summary
        StructField("quantile_values", ArrayType(DoubleType())),
    ]
)


def _point_rows(metric: dict) -> Iterator[dict]:
    base = {"name": metric.get("name"), "unit": metric.get("unit")}
    for kind in ("gauge", "sum"):
        for pt in metric.get(kind, {}).get("dataPoints", []):
            yield {
                **base, "kind": kind,
                "time_unix_nano": pt.get("timeUnixNano"),
                "attributes": _attr_map(pt.get("attributes")),
                "value": float(pt["asDouble"]) if "asDouble" in pt
                else (float(pt["asInt"]) if "asInt" in pt else None),
            }
    for pt in metric.get("histogram", {}).get("dataPoints", []):
        yield {
            **base, "kind": "histogram",
            "time_unix_nano": pt.get("timeUnixNano"),
            "attributes": _attr_map(pt.get("attributes")),
            "count": pt.get("count"), "sum": pt.get("sum"),
            "bucket_counts": pt.get("bucketCounts"),
            "explicit_bounds": pt.get("explicitBounds"),
        }
    for pt in metric.get("exponentialHistogram", {}).get("dataPoints", []):
        pos = pt.get("positive", {})
        yield {
            **base, "kind": "exponential_histogram",
            "time_unix_nano": pt.get("timeUnixNano"),
            "attributes": _attr_map(pt.get("attributes")),
            "count": pt.get("count"), "sum": pt.get("sum"),
            "scale": pt.get("scale"), "zero_count": pt.get("zeroCount"),
            "positive_offset": pos.get("offset"),
            "positive_counts": pos.get("bucketCounts"),
        }
    for pt in metric.get("summary", {}).get("dataPoints", []):
        qv = pt.get("quantileValues", [])
        yield {
            **base, "kind": "summary",
            "time_unix_nano": pt.get("timeUnixNano"),
            "attributes": _attr_map(pt.get("attributes")),
            "count": pt.get("count"), "sum": pt.get("sum"),
            "quantiles": [q.get("quantile") for q in qv],
            "quantile_values": [q.get("value") for q in qv],
        }


def otlp_metric_points(
    df: DataFrame, *, value_col: str = "content"
) -> DataFrame:
    """Explode binary ExportMetricsServiceRequest payloads into one
    typed row per metric data point (``METRIC_POINT_SCHEMA``) covering
    all five OTel metric kinds — the metrics counterpart of
    :func:`otlp_log_records` (reference: decoding/format/otlp.rs maps
    these onto Metric events; histogram/summary points correspond to
    the AggregatedHistogram / AggregatedSummary value shapes served by
    operators/aggregate.py and operators/sketch.py).  Invalid payloads
    yield no rows (dropped-channel convention)."""

    cols = [f.name for f in METRIC_POINT_SCHEMA.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[value_col]:
                if b is None:
                    continue
                try:
                    req = decode_otlp_py(bytes(b), ("metrics",))
                except ValueError:
                    continue
                for rm in req.get("resourceMetrics", []):
                    res_attrs = _attr_map(
                        rm.get("resource", {}).get("attributes")
                    )
                    for sm in rm.get("scopeMetrics", []):
                        scope = sm.get("scope", {}).get("name")
                        for metric in sm.get("metrics", []):
                            for row in _point_rows(metric):
                                full = {
                                    "resource_attributes": res_attrs,
                                    "scope_name": scope,
                                    **row,
                                }
                                # explicit None for absent columns —
                                # pandas would otherwise fill NaN,
                                # which Arrow rejects for array fields
                                rows.append(
                                    {c: full.get(c) for c in cols}
                                )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(gen, METRIC_POINT_SCHEMA)


#: flattened span schema — one row per span, the trace_to_log-shaped
#: mapping (the reference relabels TraceEvents into the log stream;
#: operators/metrics.py:trace_to_log is the operator-side counterpart)
SPAN_SCHEMA = StructType(
    [
        StructField("resource_attributes",
                    MapType(StringType(), StringType())),
        StructField("scope_name", StringType()),
        StructField("trace_id", StringType()),
        StructField("span_id", StringType()),
        StructField("parent_span_id", StringType()),
        StructField("name", StringType()),
        StructField("kind", LongType()),
        StructField("start_time_unix_nano", LongType()),
        StructField("end_time_unix_nano", LongType()),
        StructField("duration_ns", LongType()),
        StructField("attributes", MapType(StringType(), StringType())),
        StructField("status_code", LongType()),
        StructField("status_message", StringType()),
    ]
)


def otlp_spans(df: DataFrame, *, value_col: str = "content") -> DataFrame:
    """Explode binary ExportTraceServiceRequest payloads into one typed
    row per Span (``SPAN_SCHEMA``) — completes the flatten trio with
    :func:`otlp_log_records` and :func:`otlp_metric_points`.
    ``duration_ns`` is precomputed (end - start) since latency rollups
    are what trace pipelines aggregate first.  Invalid payloads yield
    no rows (dropped-channel convention)."""

    cols = [f.name for f in SPAN_SCHEMA.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[value_col]:
                if b is None:
                    continue
                try:
                    req = decode_otlp_py(bytes(b), ("traces",))
                except ValueError:
                    continue
                for rs in req.get("resourceSpans", []):
                    res_attrs = _attr_map(
                        rs.get("resource", {}).get("attributes")
                    )
                    for ss in rs.get("scopeSpans", []):
                        scope = ss.get("scope", {}).get("name")
                        for sp in ss.get("spans", []):
                            start = sp.get("startTimeUnixNano")
                            end = sp.get("endTimeUnixNano")
                            status = sp.get("status", {})
                            full = {
                                "resource_attributes": res_attrs,
                                "scope_name": scope,
                                "trace_id": sp.get("traceId"),
                                "span_id": sp.get("spanId"),
                                "parent_span_id": sp.get("parentSpanId"),
                                "name": sp.get("name"),
                                "kind": sp.get("kind"),
                                "start_time_unix_nano": start,
                                "end_time_unix_nano": end,
                                "duration_ns": (end - start)
                                if start is not None and end is not None
                                else None,
                                "attributes": _attr_map(
                                    sp.get("attributes")
                                ),
                                "status_code": status.get("code"),
                                "status_message": status.get("message"),
                            }
                            rows.append({c: full.get(c) for c in cols})
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(gen, SPAN_SCHEMA)
