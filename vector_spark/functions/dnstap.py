"""parse_dnstap — the reference's dnstap VRL function, jar-free.

The reference parses dnstap frames (the protobuf envelope DNS servers
emit through Frame Streams) into a typed event:
`/root/reference/lib/vector-vrl/dnstap-parser/src/parser.rs` drives the
field layout (key names from `schema.rs`), and
`/root/reference/lib/dnsmsg-parser/src/dns_message_parser.rs` decodes
the embedded DNS wire messages (RFC 1035).

Spark re-expression:

- the dnstap envelope is decoded with THIS repo's own descriptor-driven
  protobuf codec (`sources/protobuf.py`) against the public dnstap.proto
  schema embedded below — no new wire code;
- the DNS message decoder is a pure-Python RFC 1035 reader (header,
  name decompression, question/answer/authority/additional sections,
  EDNS OPT pseudo-section, rdata rendering for the common record
  types with the reference's exact string formats);
- `parse_dnstap(col)` is an Arrow-batched pandas UDF emitting JSON —
  pair with `from_json` for typed access; the hot path after the codec
  boundary stays JVM-side (the otlp.py / protobuf.py pattern).

Error conventions mirror the reference: a DNS payload that fails to
parse keeps the envelope fields and adds `error` + base64 `rawData`
(parser.rs:152-171); an invalid protobuf frame makes the whole result
NULL (the VRL function error under this repo's NULL-on-invalid rule).
"""

from __future__ import annotations

import base64
import json
import struct

import pandas as pd
from pyspark.sql import Column, functions as F

#: dnstap.proto (public schema, dnstap.info) — the subset the reference
#: reads (parser.rs uses identity/version/extra/type/message and every
#: Message field except the DoH policy extensions).
DNSTAP_PROTO = """
syntax = "proto2";
package dnstap;

message Dnstap {
  optional bytes identity = 1;
  optional bytes version = 2;
  optional bytes extra = 3;
  enum Type { MESSAGE = 1; }
  required Type type = 15;
  optional Message message = 14;
}

message Message {
  enum Type {
    AUTH_QUERY = 1; AUTH_RESPONSE = 2;
    RESOLVER_QUERY = 3; RESOLVER_RESPONSE = 4;
    CLIENT_QUERY = 5; CLIENT_RESPONSE = 6;
    FORWARDER_QUERY = 7; FORWARDER_RESPONSE = 8;
    STUB_QUERY = 9; STUB_RESPONSE = 10;
    TOOL_QUERY = 11; TOOL_RESPONSE = 12;
    UPDATE_QUERY = 13; UPDATE_RESPONSE = 14;
  }
  enum SocketFamily { INET = 1; INET6 = 2; }
  enum SocketProtocol {
    UDP = 1; TCP = 2; DOT = 3; DOH = 4;
    DNSCryptUDP = 5; DNSCryptTCP = 6; DOQ = 7;
  }
  required Type type = 1;
  optional SocketFamily socket_family = 2;
  optional SocketProtocol socket_protocol = 3;
  optional bytes query_address = 4;
  optional bytes response_address = 5;
  optional uint32 query_port = 6;
  optional uint32 response_port = 7;
  optional uint64 query_time_sec = 8;
  optional fixed32 query_time_nsec = 9;
  optional bytes query_message = 10;
  optional bytes query_zone = 11;
  optional uint64 response_time_sec = 12;
  optional fixed32 response_time_nsec = 13;
  optional bytes response_message = 14;
}
"""

_REGISTRY = None


def _registry() -> dict:
    global _REGISTRY
    if _REGISTRY is None:
        from vector_spark.sources.protobuf import parse_proto_text

        _REGISTRY = parse_proto_text(DNSTAP_PROTO)
    return _REGISTRY


#: to_dnstap_message_type (parser.rs:1042-1060)
MESSAGE_TYPES = {
    1: "AuthQuery", 2: "AuthResponse", 3: "ResolverQuery",
    4: "ResolverResponse", 5: "ClientQuery", 6: "ClientResponse",
    7: "ForwarderQuery", 8: "ForwarderResponse", 9: "StubQuery",
    10: "StubResponse", 11: "ToolQuery", 12: "ToolResponse",
    13: "UpdateQuery", 14: "UpdateResponse",
}
#: enum symbol (proto) → numeric id, for the protobuf codec's by-name
#: decode output
_ENUM_TO_ID = {
    "AUTH_QUERY": 1, "AUTH_RESPONSE": 2, "RESOLVER_QUERY": 3,
    "RESOLVER_RESPONSE": 4, "CLIENT_QUERY": 5, "CLIENT_RESPONSE": 6,
    "FORWARDER_QUERY": 7, "FORWARDER_RESPONSE": 8, "STUB_QUERY": 9,
    "STUB_RESPONSE": 10, "TOOL_QUERY": 11, "TOOL_RESPONSE": 12,
    "UPDATE_QUERY": 13, "UPDATE_RESPONSE": 14,
}
_REQUEST_TYPE_IDS = {1, 3, 5, 7, 9, 11, 13}
_RESPONSE_TYPE_IDS = {2, 4, 6, 8, 10, 12, 14}

#: common RR type mnemonics (IANA registry); unknown ids keep the
#: numeric id with a null type name, like the reference's Option<String>
RECORD_TYPES = {
    1: "A", 2: "NS", 5: "CNAME", 6: "SOA", 12: "PTR", 15: "MX",
    16: "TXT", 28: "AAAA", 33: "SRV", 35: "NAPTR", 39: "DNAME",
    41: "OPT", 43: "DS", 46: "RRSIG", 47: "NSEC", 48: "DNSKEY",
    50: "NSEC3", 51: "NSEC3PARAM", 52: "TLSA", 64: "SVCB",
    65: "HTTPS", 252: "AXFR", 255: "ANY", 257: "CAA",
}
CLASSES = {1: "IN", 2: "CS", 3: "CH", 4: "HS", 254: "NONE", 255: "ANY"}

#: EDNS option code names (hickory EdnsCode Debug names, the
#: reference's optName rendering — dns_message_parser.rs:1055-1061)
EDNS_OPTION_NAMES = {
    0: "Zero", 1: "LLQ", 2: "UL", 3: "NSID", 5: "DAU", 6: "DHU",
    7: "N3U", 8: "Subnet", 9: "Expire", 10: "Cookie", 11: "Keepalive",
    12: "Padding", 13: "Chain",
}

#: Extended DNS Error code 15 (lib/dnsmsg-parser/src/ede.rs)
EDE_OPTION_CODE = 15

#: EDE purposes (ede.rs:22-58, the IANA extended-dns-error registry)
EDE_PURPOSES = {
    0: "Other Error", 1: "Unsupported DNSKEY Algorithm",
    2: "Unsupported DS Digest Type", 3: "Stale Answer",
    4: "Forged Answer", 5: "DNSSEC Indeterminate", 6: "DNSSEC Bogus",
    7: "Signature Expired", 8: "Signature Not Yet Valid",
    9: "DNSKEY Missing", 10: "RRSIGs Missing",
    11: "No Zone Key Bit Set", 12: "NSEC Missing", 13: "Cached Error",
    14: "Not Ready", 15: "Blocked", 16: "Censored", 17: "Filtered",
    18: "Prohibited", 19: "Stale NXDomain Answer",
    20: "Not Authoritative", 21: "Not Supported",
    22: "No Reachable Authority", 23: "Network Error",
    24: "Invalid Data", 25: "Signature Expired before Valid",
    26: "Too Early", 27: "Unsupported NSEC3 Iterations Value",
    28: "Unable to conform to policy", 29: "Synthesized",
    30: "Invalid Query Type",
}


#: parse_response_code (dns_message_parser.rs:938-963)
RCODE_NAMES = {
    0: "NoError", 1: "FormErr", 2: "ServFail", 3: "NXDomain",
    4: "NotImp", 5: "Refused", 6: "YXDomain", 7: "YXRRSet",
    8: "NXRRSet", 9: "NotAuth", 10: "NotZone", 16: "BADVERS",
    17: "BADKEY", 18: "BADTIME", 19: "BADMODE", 20: "BADNAME",
    21: "BADALG", 22: "BADTRUNC", 23: "BADCOOKIE",
}


# ---------------------------------------------------------------------------
# DNS wire format (RFC 1035)


def _decode_name(buf: bytes, off: int, *, lowercase: bool = False):
    """Read a (possibly compressed) domain name; returns
    (dotted-name-with-trailing-dot, next_offset)."""
    labels = []
    jumps = 0
    end = None
    while True:
        if off >= len(buf):
            raise ValueError("name runs past end of message")
        ln = buf[off]
        if ln & 0xC0 == 0xC0:  # compression pointer
            if off + 1 >= len(buf):
                raise ValueError("truncated compression pointer")
            ptr = ((ln & 0x3F) << 8) | buf[off + 1]
            if end is None:
                end = off + 2
            off = ptr
            jumps += 1
            if jumps > 127:  # loop guard
                raise ValueError("compression pointer loop")
            continue
        if ln & 0xC0:
            raise ValueError(f"bad label length 0x{ln:02x}")
        off += 1
        if ln == 0:
            break
        labels.append(buf[off:off + ln].decode("ascii", "replace"))
        off += ln
    name = ".".join(labels) + "." if labels else "."
    if lowercase:
        name = name.lower()
    return name, (end if end is not None else off)


def encode_name(name: str) -> bytes:
    out = bytearray()
    for label in name.rstrip(".").split("."):
        if label:
            raw = label.encode("ascii")
            out += bytes([len(raw)]) + raw
    out += b"\x00"
    return bytes(out)


def _format_rdata(rtype: int, rdata: bytes, buf: bytes, off: int,
                  lowercase: bool):
    """Render rdata as the reference's format_rdata strings
    (dns_message_parser.rs:542-660) for the common types; unknown types
    return (None, raw bytes) — the rDataBytes path."""
    def name_at(o):
        return _decode_name(buf, o, lowercase=lowercase)[0]

    if rtype == 1 and len(rdata) >= 4:  # A
        return ".".join(str(b) for b in rdata[:4]), None
    if rtype == 28 and len(rdata) >= 16:  # AAAA
        import ipaddress

        return str(ipaddress.IPv6Address(rdata[:16])), None
    if rtype in (2, 5, 12, 39):  # NS / CNAME / PTR / DNAME
        return name_at(off), None
    if rtype == 15 and len(rdata) >= 3:  # MX: "pref exchange."
        pref = struct.unpack(">H", rdata[:2])[0]
        return f"{pref} {name_at(off + 2)}", None
    if rtype == 16:  # TXT: "chunk" per string, escaped \\ and \"
        parts, i = [], 0
        while i < len(rdata):
            ln = rdata[i]
            chunk = rdata[i + 1:i + 1 + ln].decode("utf-8", "replace")
            chunk = chunk.replace("\\", "\\\\").replace('"', '\\"')
            parts.append(f'"{chunk}"')
            i += 1 + ln
        return " ".join(parts), None
    if rtype == 6:  # SOA: "mname. rname. serial refresh retry expire min"
        mname, o = _decode_name(buf, off, lowercase=lowercase)
        rname, o = _decode_name(buf, o, lowercase=lowercase)
        if o + 20 <= len(buf):
            serial, refresh, retry, expire, minimum = struct.unpack(
                ">IIIII", buf[o:o + 20]
            )
            return (f"{mname} {rname} {serial} {refresh} {retry} "
                    f"{expire} {minimum}"), None
    if rtype == 33 and len(rdata) >= 7:  # SRV: "prio weight port target."
        prio, weight, port = struct.unpack(">HHH", rdata[:6])
        return f"{prio} {weight} {port} {name_at(off + 6)}", None

    def esc(s: bytes) -> str:
        # escape_string_for_text_representation: backslash then quote
        return (s.decode("utf-8", "replace")
                .replace("\\", "\\\\").replace('"', '\\"'))

    if rtype == 257 and len(rdata) >= 2:  # CAA: 'crit tag "value"'
        crit = (rdata[0] >> 7) & 1
        tlen = rdata[1]
        tag = rdata[2:2 + tlen].decode("ascii", "replace")
        value = rdata[2 + tlen:].decode("utf-8", "replace")
        return f'{crit} {tag} "{value}"', None
    if rtype == 35 and len(rdata) >= 4:  # NAPTR
        order, pref = struct.unpack(">HH", rdata[:4])
        i = 4
        parts = []
        for _ in range(3):  # flags, services, regexp character-strings
            if i >= len(rdata):
                raise ValueError("truncated NAPTR rdata")
            ln = rdata[i]
            parts.append(esc(rdata[i + 1:i + 1 + ln]))
            i += 1 + ln
        repl = name_at(off + i)
        return (f'{order} {pref} "{parts[0]}" "{parts[1]}" '
                f'"{parts[2]}" {repl}'), None
    if rtype == 43 and len(rdata) >= 4:  # DS: 'tag algo dtype HEXDIGEST'
        tag, algo, dtype = struct.unpack(">HBB", rdata[:4])
        return f"{tag} {algo} {dtype} {rdata[4:].hex().upper()}", None
    if rtype == 48 and len(rdata) >= 4:  # DNSKEY (format_dnskey_record)
        flags, _proto, algo = struct.unpack(">HBB", rdata[:4])
        if flags & 0x0080:  # REVOKE
            shown = 0
        elif (flags & 0x0100) and (flags & 0x0001):  # zone key + SEP
            shown = 257
        else:
            shown = 256
        key = base64.b64encode(rdata[4:]).decode("ascii")
        return f"{shown} 3 {algo} {key}", None
    return None, base64.b64encode(rdata).decode("ascii")


def decode_dns_message(data: bytes, *, lowercase: bool = False,
                       update_form: bool = False) -> dict:
    """One DNS wire message → the reference's requestData/responseData
    object: fullRcode + rcodeName + header + question/answers/
    authority/additional sections (+ opt pseudo-section when an EDNS
    OPT record is present).

    ``update_form`` renders the DNS UPDATE layout instead
    (parser.rs:714-853 / dns_message_parser.rs:123-140): the same wire
    sections re-keyed as zone (zName/zType/zTypeId/zClass, from the
    first question entry) / prerequisite / update / additional, with
    the UpdateHeader count names (zoCount/prCount/upCount/adCount)."""
    if len(data) < 12:
        raise ValueError("message shorter than the 12-byte header")
    qid, flags, qd, an, ns, ar = struct.unpack(">HHHHHH", data[:12])
    rcode = flags & 0xF
    if update_form:
        header = {
            "id": qid,
            "opcode": (flags >> 11) & 0xF,
            "rcode": rcode,
            "qr": (flags >> 15) & 1,
            "zoCount": qd, "prCount": an, "upCount": ns, "adCount": ar,
        }
    else:
        header = {
            "id": qid,
            "opcode": (flags >> 11) & 0xF,
            "rcode": rcode,
            "qr": (flags >> 15) & 1,
            "aa": bool((flags >> 10) & 1),
            "tc": bool((flags >> 9) & 1),
            "rd": bool((flags >> 8) & 1),
            "ra": bool((flags >> 7) & 1),
            "ad": bool((flags >> 5) & 1),
            "cd": bool((flags >> 4) & 1),
            "qdCount": qd, "anCount": an, "nsCount": ns, "arCount": ar,
        }
    off = 12
    question = []
    for _ in range(qd):
        name, off = _decode_name(data, off, lowercase=lowercase)
        if off + 4 > len(data):
            raise ValueError("truncated question section")
        qtype, qclass = struct.unpack(">HH", data[off:off + 4])
        off += 4
        q = {"domainName": name,
             "questionTypeId": qtype,
             "class": CLASSES.get(qclass, str(qclass))}
        if qtype in RECORD_TYPES:
            q["questionType"] = RECORD_TYPES[qtype]
        question.append(q)

    opt = None
    full_rcode = rcode

    def read_records(n):
        nonlocal off, opt, full_rcode
        out = []
        for _ in range(n):
            name, o = _decode_name(data, off, lowercase=lowercase)
            if o + 10 > len(data):
                raise ValueError("truncated record header")
            rtype, rclass, ttl, rdlen = struct.unpack(
                ">HHIH", data[o:o + 10]
            )
            rd_off = o + 10
            if rd_off + rdlen > len(data):
                raise ValueError("truncated rdata")
            rdata = data[rd_off:rd_off + rdlen]
            off = rd_off + rdlen
            if rtype == 41:  # EDNS OPT pseudo-record (RFC 6891)
                ext_rcode = (ttl >> 24) & 0xFF
                opt = {
                    "extendedRcode": ext_rcode,
                    "ednsVersion": (ttl >> 16) & 0xFF,
                    "do": bool((ttl >> 15) & 1),
                    "udpPayloadSize": rclass,
                    "options": [],
                    "ede": [],
                }
                i = 0
                while i + 4 <= len(rdata):
                    code, olen = struct.unpack(">HH", rdata[i:i + 4])
                    body = rdata[i + 4:i + 4 + olen]
                    i += 4 + olen
                    if code == EDE_OPTION_CODE:
                        # Extended DNS Error (ede.rs): u16 info-code +
                        # optional UTF-8 text; bad UTF-8 is a parse
                        # error like the reference's DecodeError::Utf8
                        if len(body) < 2:
                            raise ValueError("truncated EDE option")
                        info = struct.unpack(">H", body[:2])[0]
                        entry = {"infoCode": info}
                        if info in EDE_PURPOSES:
                            entry["purpose"] = EDE_PURPOSES[info]
                        if len(body) > 2:
                            try:
                                entry["extraText"] = body[2:].decode(
                                    "utf-8")
                            except UnicodeDecodeError as exc:
                                raise ValueError(
                                    f"invalid EDE text: {exc}") from exc
                        opt["ede"].append(entry)
                        continue
                    opt["options"].append({
                        "optCode": code,
                        "optName": EDNS_OPTION_NAMES.get(
                            code, f"Unknown({code})"),
                        "optValue": base64.b64encode(body).decode("ascii"),
                    })
                full_rcode = (ext_rcode << 4) | rcode
                continue
            rec = {"domainName": name,
                   "recordTypeId": rtype,
                   "ttl": ttl,
                   "class": CLASSES.get(rclass, str(rclass))}
            if rtype in RECORD_TYPES:
                rec["recordType"] = RECORD_TYPES[rtype]
            rendered, raw = _format_rdata(
                rtype, rdata, data, rd_off, lowercase
            )
            if rendered is not None:
                rec["rData"] = rendered
            if raw is not None:
                rec["rDataBytes"] = raw
            out.append(rec)
        return out

    answers = read_records(an)
    authority = read_records(ns)
    additional = read_records(ar)

    if update_form:
        msg = {
            "fullRcode": full_rcode,
            "header": header,
            "prerequisite": answers,
            "update": authority,
            "additional": additional,
        }
        if question:
            # ZoneInfo from the first query entry (dns_message.rs:104)
            q0 = question[0]
            zone = {"zName": q0["domainName"],
                    "zTypeId": q0["questionTypeId"],
                    "zClass": q0["class"]}
            if "questionType" in q0:
                zone["zType"] = q0["questionType"]
            msg["zone"] = zone
    else:
        msg = {
            "fullRcode": full_rcode,
            "header": header,
            "question": question,
            "answers": answers,
            "authority": authority,
            "additional": additional,
        }
    if full_rcode in RCODE_NAMES:
        msg["rcodeName"] = RCODE_NAMES[full_rcode]
    if opt is not None:
        msg["opt"] = opt
    return msg


# ---------------------------------------------------------------------------
# dnstap envelope


def _ip_str(b64: str, family: int) -> str | None:
    import ipaddress

    raw = base64.b64decode(b64)
    if family == 1:
        if len(raw) < 4:
            raise ValueError("Cannot parse address")
        return str(ipaddress.IPv4Address(raw[:4]))
    if len(raw) < 16:
        raise ValueError("Cannot parse address")
    return str(ipaddress.IPv6Address(raw[:16]))


def decode_dnstap_frame(frame: bytes, *, lowercase: bool = False) -> dict:
    """One dnstap protobuf frame → the parse_dnstap event object
    (parser.rs:95-263 field-for-field; key names from schema.rs).

    An undecodable envelope raises ValueError — ONE error surface for
    malformed input (the prost decode error in the reference), whatever
    the underlying codec exception was."""
    from vector_spark.sources.protobuf import decode_message

    try:
        pb = decode_message(frame, _registry(), "dnstap.Dnstap")
    except ValueError:
        raise
    except Exception as exc:  # wire-level garbage from a generic codec
        raise ValueError(f"invalid dnstap frame: {exc}") from exc
    out: dict = {}
    if "identity" in pb:
        out["serverId"] = base64.b64decode(pb["identity"]).decode(
            "utf-8", "replace")
    if "version" in pb:
        out["serverVersion"] = base64.b64decode(pb["version"]).decode(
            "utf-8", "replace")
    if "extra" in pb:
        out["extraInfo"] = base64.b64decode(pb["extra"]).decode(
            "utf-8", "replace")
    dtype_id = 1 if pb.get("type") == "MESSAGE" else int(
        pb.get("type") or 0)
    out["dataTypeId"] = dtype_id
    if dtype_id != 1:
        out["rawData"] = base64.b64encode(frame).decode("ascii")
        return out
    out["dataType"] = "Message"
    m = pb.get("message")
    if m is None:
        return out
    try:
        _decode_dnstap_message(out, m, lowercase)
    except ValueError as err:
        out["error"] = str(err)
        out["rawData"] = base64.b64encode(frame).decode("ascii")
    return out


def _decode_dnstap_message(out: dict, m: dict, lowercase: bool) -> None:
    fam = {"INET": 1, "INET6": 2}.get(m.get("socket_family"))
    if fam is not None:
        out["socketFamily"] = "INET" if fam == 1 else "INET6"
        if "socket_protocol" in m:
            out["socketProtocol"] = m["socket_protocol"]
        if "query_address" in m:
            out["sourceAddress"] = _ip_str(m["query_address"], fam)
        if "query_port" in m:
            out["sourcePort"] = m["query_port"]
        if "response_address" in m:
            out["responseAddress"] = _ip_str(m["response_address"], fam)
        if "response_port" in m:
            out["responsePort"] = m["response_port"]
    if "query_zone" in m:
        # query_zone is an uncompressed DNS name (parser.rs:191-204)
        raw_zone = base64.b64decode(m["query_zone"])
        out["queryZone"] = _decode_name(raw_zone, 0,
                                        lowercase=lowercase)[0]
    type_id = _ENUM_TO_ID.get(m.get("type"), 0)
    out["messageTypeId"] = type_id
    out["messageType"] = MESSAGE_TYPES.get(
        type_id, f"Unknown dnstap message type: {type_id}")

    def set_time(sec, nsec, own_set, msg_key_absent):
        from datetime import datetime, timezone

        t_ns = int(sec) * 1_000_000_000 + int(nsec or 0)
        if type_id in own_set:
            out["time"] = t_ns
            out["timePrecision"] = "ns"
            # the host timestamp key: RFC3339 with the nanosecond
            # precision the reference's chrono timestamp carries
            dt = datetime.fromtimestamp(int(sec), tz=timezone.utc)
            iso = dt.strftime("%Y-%m-%dT%H:%M:%S")
            if nsec:
                iso += f".{int(nsec):09d}"
            out["timestamp"] = iso + "Z"
        if msg_key_absent:
            # the reference logs the time under the absent message's
            # section (parse_dnstap_message_time, parser.rs:430-437)
            sec_key = ("requestData" if own_set is _REQUEST_TYPE_IDS
                       else "responseData")
            out.setdefault(sec_key, {})["time"] = t_ns
            out[sec_key]["timePrecision"] = "ns"

    if "query_time_sec" in m:
        set_time(m["query_time_sec"], m.get("query_time_nsec"),
                 _REQUEST_TYPE_IDS, "query_message" not in m)
    if "response_time_sec" in m:
        set_time(m["response_time_sec"], m.get("response_time_nsec"),
                 _RESPONSE_TYPE_IDS, "response_message" not in m)

    if type_id not in MESSAGE_TYPES:
        raise ValueError(
            f"Unsupported DNSTap message type: {type_id}")
    # UpdateQuery/UpdateResponse (13/14) parse as DNS UPDATE messages
    # (parser.rs:323-373)
    update_form = type_id in (13, 14)
    if "query_message" in m:
        raw = base64.b64decode(m["query_message"])
        out["requestMessageSize"] = len(raw)
        parsed = decode_dns_message(
            raw, lowercase=lowercase, update_form=update_form)
        parsed.update(out.get("requestData") or {})
        out["requestData"] = parsed
    if "response_message" in m:
        raw = base64.b64decode(m["response_message"])
        out["responseMessageSize"] = len(raw)
        parsed = decode_dns_message(
            raw, lowercase=lowercase, update_form=update_form)
        parsed.update(out.get("responseData") or {})
        out["responseData"] = parsed


def encode_dnstap_frame(
    *,
    message_type: int,
    query_message: bytes | None = None,
    response_message: bytes | None = None,
    socket_family: int = 1,
    socket_protocol: int = 1,
    query_address: bytes | None = None,
    query_port: int | None = None,
    query_time_sec: int | None = None,
    query_time_nsec: int | None = None,
    identity: bytes | None = None,
) -> bytes:
    """Build a dnstap frame (test/bench generator — the shape a DNS
    server's Frame Streams socket would emit)."""
    from vector_spark.sources.protobuf import encode_message

    b64 = lambda b: base64.b64encode(b).decode("ascii")  # noqa: E731
    msg: dict = {
        "type": {v: k for k, v in _ENUM_TO_ID.items()}[message_type],
        "socket_family": "INET" if socket_family == 1 else "INET6",
        "socket_protocol": {1: "UDP", 2: "TCP"}.get(
            socket_protocol, "UDP"),
    }
    if query_address is not None:
        msg["query_address"] = b64(query_address)
    if query_port is not None:
        msg["query_port"] = query_port
    if query_time_sec is not None:
        msg["query_time_sec"] = query_time_sec
    if query_time_nsec is not None:
        msg["query_time_nsec"] = query_time_nsec
    if query_message is not None:
        msg["query_message"] = b64(query_message)
    if response_message is not None:
        msg["response_message"] = b64(response_message)
    env: dict = {"type": "MESSAGE", "message": msg}
    if identity is not None:
        env["identity"] = b64(identity)
    return encode_message(env, _registry(), "dnstap.Dnstap")


def encode_dns_query(qid: int, qname: str, qtype: int, *,
                     rd: bool = True) -> bytes:
    """Minimal DNS query wire message (test/bench generator)."""
    flags = 0x0100 if rd else 0
    head = struct.pack(">HHHHHH", qid & 0xFFFF, flags, 1, 0, 0, 0)
    return head + encode_name(qname) + struct.pack(">HH", qtype, 1)


# ---------------------------------------------------------------------------
# Spark surface


def parse_dnstap(col: Column, *, lowercase_hostnames: bool = False) -> Column:
    """VRL parse_dnstap (lib/vector-vrl/dnstap-parser): binary dnstap
    frame → JSON string of the parsed event (pair with from_json).
    Invalid protobuf → NULL; a DNS payload that fails to parse keeps
    the envelope and carries `error` + base64 `rawData`, like the
    reference."""

    @F.pandas_udf("string")
    def _udf(frames: pd.Series) -> pd.Series:
        out = []
        for frame in frames:
            if frame is None:
                out.append(None)
                continue
            try:
                out.append(json.dumps(
                    decode_dnstap_frame(
                        bytes(frame), lowercase=lowercase_hostnames),
                    sort_keys=True,
                ))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype=object)

    return _udf(col)


def encode_dnstap(
    qid: Column, qname: Column, qtype: Column, src_ip: Column,
    src_port: Column, ts_sec: Column, message_type: Column,
) -> Column:
    """Deterministic dnstap frame builder (binary column) — the
    generator side of the dnstap round-trip query and tests."""
    import socket as _socket

    @F.pandas_udf("binary")
    def _udf(qids: pd.Series, names: pd.Series, types: pd.Series,
             ips: pd.Series, ports: pd.Series, secs: pd.Series,
             mtypes: pd.Series) -> pd.Series:
        out = []
        for qid_, name, typ, ip, port, sec, mt in zip(
                qids, names, types, ips, ports, secs, mtypes):
            wire = encode_dns_query(int(qid_), str(name), int(typ))
            mt = int(mt)
            out.append(encode_dnstap_frame(
                message_type=mt,
                query_message=wire if mt in _REQUEST_TYPE_IDS else None,
                response_message=(
                    wire if mt in _RESPONSE_TYPE_IDS else None),
                query_address=_socket.inet_aton(str(ip)),
                query_port=int(port),
                query_time_sec=int(sec),
            ))
        return pd.Series(out, dtype=object)

    return _udf(qid, qname, qtype, src_ip, src_port, ts_sec, message_type)


# ---------------------------------------------------------------------------
# Frame Streams (fstrm) — the byte-stream container dnstap rides in
# (/root/reference/src/sources/util/framestream.rs)

#: content type the reference's dnstap source requires
#: (src/sources/dnstap/mod.rs)
DNSTAP_CONTENT_TYPE = b"protobuf:dnstap.Dnstap"

_CTRL_ACCEPT, _CTRL_START, _CTRL_STOP = 0x01, 0x02, 0x03
_CTRL_READY, _CTRL_FINISH = 0x04, 0x05
_FIELD_CONTENT_TYPE = 0x01


def fstrm_split(payload: bytes) -> list[bytes]:
    """Frame Streams byte stream → dnstap data frames, running the
    reference's state machine (framestream.rs:176-196): every frame is
    u32-BE length-prefixed; a ZERO length escapes the next frame as a
    control frame; data frames count only while reading (after Start,
    before Stop).  Truncated tail = malformed → ValueError."""
    out: list[bytes] = []
    expect_control = False
    reading = False
    i = 0
    while i < len(payload):
        if i + 4 > len(payload):
            raise ValueError("malformed frame")
        n = int.from_bytes(payload[i:i + 4], "big")
        i += 4
        if n == 0:
            expect_control = True
            continue
        if i + n > len(payload):
            raise ValueError("malformed frame")
        frame = payload[i:i + n]
        i += n
        if expect_control:
            expect_control = False
            header = int.from_bytes(frame[:4], "big") if len(frame) >= 4 \
                else -1
            if header == _CTRL_START:
                reading = True
            elif header == _CTRL_STOP:
                reading = False
        elif reading:
            out.append(frame)
        # else: data frame outside ReadingData — dropped with an error
        # log in the reference (framestream.rs:189-195)
    return out


def fstrm_encode(frames: list[bytes],
                 content_type: bytes = DNSTAP_CONTENT_TYPE) -> bytes:
    """Render data frames as a Frame Streams byte stream:
    Start control (with a ContentType field) + data frames + Stop."""
    def control(header: int, fields: bytes = b"") -> bytes:
        body = header.to_bytes(4, "big") + fields
        return (0).to_bytes(4, "big") + len(body).to_bytes(4, "big") + body

    ct = (_FIELD_CONTENT_TYPE.to_bytes(4, "big")
          + len(content_type).to_bytes(4, "big") + content_type)
    out = bytearray(control(_CTRL_START, ct))
    for f in frames:
        out += len(f).to_bytes(4, "big") + f
    out += control(_CTRL_STOP)
    return bytes(out)


def fstrm_frames(col: Column) -> Column:
    """Binary Frame Streams payload → array<binary> of dnstap data
    frames (NULL on a malformed stream)."""

    @F.pandas_udf("array<binary>")
    def _udf(payloads: pd.Series) -> pd.Series:
        def split(p):
            if p is None:
                return None
            try:
                return fstrm_split(bytes(p))
            except ValueError:
                return None
        return payloads.map(split)

    return _udf(col)
