"""parse_dnstap (lib/vector-vrl/dnstap-parser + lib/dnsmsg-parser):
envelope fields, DNS wire decoding, rdata formats, error channels."""

from __future__ import annotations

import json
import socket
import struct

import pytest
from pyspark.sql import functions as F

from vector_spark.functions.dnstap import (
    RCODE_NAMES,
    decode_dns_message,
    decode_dnstap_frame,
    encode_dns_query,
    encode_dnstap_frame,
    encode_name,
    parse_dnstap,
)


def _rr(name_bytes, rtype, rclass, ttl, rdata):
    return name_bytes + struct.pack(">HHIH", rtype, rclass, ttl,
                                    len(rdata)) + rdata


def test_client_query_envelope():
    wire = encode_dns_query(4242, "API.svc.Example.com", 1)
    frame = encode_dnstap_frame(
        message_type=5, query_message=wire,
        query_address=socket.inet_aton("10.1.2.3"), query_port=53533,
        query_time_sec=1767225600, query_time_nsec=123456789,
        identity=b"ns1",
    )
    ev = decode_dnstap_frame(frame)
    assert ev["serverId"] == "ns1"
    assert ev["dataType"] == "Message" and ev["dataTypeId"] == 1
    assert ev["messageType"] == "ClientQuery" and ev["messageTypeId"] == 5
    assert ev["socketFamily"] == "INET" and ev["socketProtocol"] == "UDP"
    assert ev["sourceAddress"] == "10.1.2.3" and ev["sourcePort"] == 53533
    assert ev["time"] == 1767225600123456789
    assert ev["timePrecision"] == "ns"
    assert ev["timestamp"] == "2026-01-01T00:00:00.123456789Z"
    rd = ev["requestData"]
    assert rd["header"]["id"] == 4242 and rd["header"]["rd"] is True
    assert rd["question"][0]["domainName"] == "API.svc.Example.com."
    assert rd["question"][0]["questionType"] == "A"
    assert rd["rcodeName"] == "NoError"
    assert ev["requestMessageSize"] == len(wire)
    # lowercase_hostnames option (DnsParserOptions)
    low = decode_dnstap_frame(frame, lowercase=True)
    assert low["requestData"]["question"][0]["domainName"] == \
        "api.svc.example.com."


def test_response_records_compression_and_rdata_formats():
    head = struct.pack(">HHHHHH", 7, 0x8583, 1, 3, 1, 1)
    q = encode_name("example.com") + struct.pack(">HH", 255, 1)
    ptr = b"\xc0\x0c"  # compression pointer to the question name
    a = _rr(ptr, 1, 1, 300, bytes([93, 184, 216, 34]))
    aaaa = _rr(ptr, 28, 1, 300,
               socket.inet_pton(socket.AF_INET6, "2606:2800:21f::1"))
    mx = _rr(ptr, 15, 1, 60, struct.pack(">H", 10) + encode_name("mail.example.com"))
    soa_rdata = (encode_name("ns1.example.com") + encode_name("hostmaster.example.com")
                 + struct.pack(">IIIII", 2026, 7200, 900, 1209600, 86400))
    soa = _rr(ptr, 6, 1, 3600, soa_rdata)
    srv = _rr(encode_name("_sip._tcp.example.com"), 33, 1, 60,
              struct.pack(">HHH", 5, 10, 5060) + encode_name("sip.example.com"))
    msg = decode_dns_message(head + q + a + aaaa + mx + soa + srv)
    h = msg["header"]
    # flags 0x8583: qr aa rd ra + rcode 3
    assert h["qr"] == 1 and h["aa"] and h["rd"] and h["ra"]
    assert h["rcode"] == 3 and msg["rcodeName"] == "NXDomain"
    assert msg["question"][0]["questionType"] == "ANY"
    ans = {r["recordType"]: r["rData"] for r in msg["answers"]}
    assert ans["A"] == "93.184.216.34"
    assert ans["AAAA"] == "2606:2800:21f::1"
    assert ans["MX"] == "10 mail.example.com."
    assert msg["authority"][0]["rData"] == (
        "ns1.example.com. hostmaster.example.com. 2026 7200 900 "
        "1209600 86400")
    assert msg["additional"][0]["rData"] == "5 10 5060 sip.example.com."
    assert msg["additional"][0]["domainName"] == "_sip._tcp.example.com."


def test_txt_escaping_and_unknown_rtype_bytes():
    head = struct.pack(">HHHHHH", 1, 0x8000, 0, 2, 0, 0)
    txt = _rr(encode_name("t.x"), 16, 1, 1,
              bytes([7]) + b'a"b\\c,d' + bytes([0]))
    unk = _rr(encode_name("u.x"), 999, 1, 1, b"\x01\x02")
    msg = decode_dns_message(head + txt + unk)
    assert msg["answers"][0]["rData"] == '"a\\"b\\\\c,d" ""'
    u = msg["answers"][1]
    assert "recordType" not in u and u["recordTypeId"] == 999
    assert u["rDataBytes"] == "AQI="  # base64 of 0x01 0x02


def test_edns_opt_and_full_rcode():
    head = struct.pack(">HHHHHH", 2, 0x8100, 0, 0, 0, 1)
    opt = b"\x00" + struct.pack(">HHIH", 41, 1232, 0x01008000, 4) \
        + struct.pack(">HH", 10, 0)  # COOKIE option, empty
    msg = decode_dns_message(head + opt)
    assert msg["opt"] == {
        "extendedRcode": 1, "ednsVersion": 0, "do": True,
        "udpPayloadSize": 1232,
        "options": [{"optCode": 10, "optName": "Cookie", "optValue": ""}],
        "ede": [],
    }
    assert msg["fullRcode"] == 16 and msg["rcodeName"] == "BADVERS"
    # OPT is a pseudo-record: kept out of additional, counted in arCount
    assert msg["additional"] == [] and msg["header"]["arCount"] == 1


def test_edns_ede_entries():
    """EDE options (code 15, ede.rs) split out of the generic options
    list into `ede` entries with infoCode/purpose/extraText."""
    ede1 = struct.pack(">HH", 15, 2) + struct.pack(">H", 6)      # Bogus
    ede2 = struct.pack(">HH", 15, 7) + struct.pack(">H", 99) + b"oops!"
    nsid = struct.pack(">HH", 3, 2) + b"ab"
    rdata = ede1 + ede2 + nsid
    head = struct.pack(">HHHHHH", 2, 0x8000, 0, 0, 0, 1)
    opt = b"\x00" + struct.pack(">HHIH", 41, 512, 0, len(rdata)) + rdata
    msg = decode_dns_message(head + opt)
    assert msg["opt"]["ede"] == [
        {"infoCode": 6, "purpose": "DNSSEC Bogus"},
        {"infoCode": 99, "extraText": "oops!"},  # unknown code: no purpose
    ]
    assert msg["opt"]["options"] == [
        {"optCode": 3, "optName": "NSID", "optValue": "YWI="}]
    # bad UTF-8 in EDE text is a message parse error (DecodeError::Utf8)
    bad = struct.pack(">HH", 15, 3) + struct.pack(">H", 1) + b"\xff"
    opt_bad = b"\x00" + struct.pack(">HHIH", 41, 512, 0, len(bad)) + bad
    with pytest.raises(ValueError, match="EDE"):
        decode_dns_message(head + opt_bad)


def test_bad_dns_payload_keeps_envelope_with_error():
    frame = encode_dnstap_frame(
        message_type=5, query_message=b"\x00\x01trash",
        query_address=socket.inet_aton("10.0.0.1"), query_port=1,
    )
    ev = decode_dnstap_frame(frame)
    assert ev["messageType"] == "ClientQuery"
    assert "error" in ev and "rawData" in ev
    assert "requestData" not in ev


def test_response_time_lands_in_absent_request_section():
    # ClientResponse with only query_time set: the reference logs the
    # time under the absent message's section (parser.rs:430-437)
    wire = encode_dns_query(9, "a.b", 1)
    frame = encode_dnstap_frame(
        message_type=6, response_message=wire,
        query_address=socket.inet_aton("10.0.0.1"), query_port=2,
        query_time_sec=100, query_time_nsec=5,
    )
    ev = decode_dnstap_frame(frame)
    assert "time" not in ev  # query time on a response type
    assert ev["requestData"] == {"time": 100000000005,
                                 "timePrecision": "ns"}
    assert ev["responseData"]["header"]["id"] == 9


def test_name_compression_loop_guard():
    head = struct.pack(">HHHHHH", 3, 0, 1, 0, 0, 0)
    evil = head + b"\xc0\x0c" + struct.pack(">HH", 1, 1)  # self-pointer
    with pytest.raises(ValueError):
        decode_dns_message(evil)


def test_rcode_names_match_reference_table():
    # dns_message_parser.rs:938-963
    assert RCODE_NAMES[0] == "NoError" and RCODE_NAMES[3] == "NXDomain"
    assert RCODE_NAMES[23] == "BADCOOKIE" and 15 not in RCODE_NAMES


def test_parse_dnstap_spark_column(spark):
    wire = encode_dns_query(77, "spark.example.com", 28)
    good = encode_dnstap_frame(
        message_type=3, query_message=wire,
        query_address=socket.inet_aton("192.0.2.1"), query_port=4242,
        query_time_sec=1767225600,
    )
    df = spark.createDataFrame(
        [(good,), (b"not protobuf at all",), (None,)], "frame binary")
    rows = df.select(parse_dnstap(F.col("frame")).alias("j")).collect()
    ev = json.loads(rows[0]["j"])
    assert ev["messageType"] == "ResolverQuery"
    assert ev["requestData"]["question"][0]["domainName"] == \
        "spark.example.com."
    assert ev["requestData"]["question"][0]["questionType"] == "AAAA"
    assert rows[1]["j"] is None and rows[2]["j"] is None


# ---------------------------------------------------------------------------
# Frame Streams container (src/sources/util/framestream.rs)


def test_fstrm_roundtrip_and_state_machine():
    from vector_spark.functions.dnstap import (
        encode_dnstap_frame, fstrm_encode, fstrm_split)

    frames = [
        encode_dnstap_frame(
            message_type=5, query_message=encode_dns_query(i, f"q{i}.x", 1),
            query_address=socket.inet_aton("10.0.0.1"), query_port=i + 1,
        )
        for i in range(3)
    ]
    blob = fstrm_encode(frames)
    assert fstrm_split(blob) == frames
    # data frame BEFORE the Start control is dropped, not emitted
    stray = len(frames[0]).to_bytes(4, "big") + frames[0]
    assert fstrm_split(stray + blob) == frames
    # data frame AFTER Stop is dropped too
    assert fstrm_split(blob + stray) == frames
    # truncated tail = malformed
    with pytest.raises(ValueError):
        fstrm_split(blob[:-3])


def test_dnstap_config_source_and_stream_equals_batch(spark, tmp_path):
    """`type: dnstap` config source over fstrm files; the streaming
    tail produces exactly the batch rows (stream == batch)."""
    import json

    from vector_spark.config import build_topology
    from vector_spark.functions.dnstap import encode_dnstap_frame, fstrm_encode
    from vector_spark.streaming.pipeline import run_to_memory, stream_dnstap

    d = tmp_path / "fstrm"
    d.mkdir()
    for i in range(3):
        frames = [
            encode_dnstap_frame(
                message_type=5,
                query_message=encode_dns_query(i * 10 + j, f"q{i}-{j}.example", 1),
                query_address=socket.inet_aton("10.0.0.1"),
                query_port=1000 + j,
            )
            for j in range(2)
        ]
        (d / f"s{i}.fstrm").write_bytes(fstrm_encode(frames))

    batch = build_topology(spark, {
        "sources": {"in": {"type": "dnstap", "path": str(d)}}
    })["in"]
    rows = batch.collect()
    assert len(rows) == 6
    ids = sorted(json.loads(r["value"])["requestData"]["header"]["id"]
                 for r in rows)
    assert ids == [0, 1, 10, 11, 20, 21]

    sdf = stream_dnstap(spark, str(d), max_files_per_trigger=1)
    assert sdf.isStreaming
    run_to_memory(sdf, "dnstap_stream_t", output_mode="append")
    got = sorted(r["value"]
                 for r in spark.sql("SELECT * FROM dnstap_stream_t").collect())
    assert got == sorted(r["value"] for r in rows)


def test_update_message_form():
    """UpdateQuery (type 13) parses as the DNS UPDATE layout
    (parser.rs:714-853): zone from the first question entry, the
    prerequisite/update/additional re-keying, and the UpdateHeader
    count names."""
    from vector_spark.functions.dnstap import encode_dnstap_frame

    # UPDATE wire: opcode 5, zone=(example.com SOA IN), one update RR
    head = struct.pack(">HHHHHH", 11, 5 << 11, 1, 0, 1, 0)
    zone = encode_name("example.com") + struct.pack(">HH", 6, 1)
    up = _rr(encode_name("new.example.com"), 1, 1, 300,
             bytes([10, 0, 0, 9]))
    wire = head + zone + up
    frame = encode_dnstap_frame(
        message_type=13, query_message=wire,
        query_address=socket.inet_aton("10.0.0.1"), query_port=5,
    )
    ev = decode_dnstap_frame(frame)
    assert ev["messageType"] == "UpdateQuery"
    rd = ev["requestData"]
    assert rd["header"] == {"id": 11, "opcode": 5, "rcode": 0, "qr": 0,
                            "zoCount": 1, "prCount": 0, "upCount": 1,
                            "adCount": 0}
    assert rd["zone"] == {"zName": "example.com.", "zType": "SOA",
                          "zTypeId": 6, "zClass": "IN"}
    assert rd["update"][0]["rData"] == "10.0.0.9"
    assert rd["prerequisite"] == [] and "question" not in rd
    assert "answers" not in rd and rd["rcodeName"] == "NoError"


#: the reference's own test capture — a real BIND 9.16.3 ResolverQuery
#: dnstap frame (parser.rs test_parse_dnstap_data_with_query_message)
_BIND_RESOLVER_QUERY_B64 = (
    "ChVqYW1lcy1WaXJ0dWFsLU1hY2hpbmUSC0JJTkQgOS4xNi4zcnoIAxACGAEiEAAAAAAAAA"
    "AAAAAAAAAAAAAqECABBQJwlAAAAAAAAAAAADAw8+0CODVA7+zq9wVNMU3WNlI2kwIAAAAB"
    "AAAAAAABCWZhY2Vib29rMQNjb20AAAEAAQAAKQIAAACAAAAMAAoACOxjCAG9zVgzWgUDY2"
    "9tAHgB"
)


def test_reference_bind_capture_full_expected_map():
    """The reference's own end-to-end test vector, value for value
    (parser.rs:1071-1176 expected_map): a real BIND 9.16.3 dnstap
    frame must decode to the exact same event."""
    import base64

    ev = decode_dnstap_frame(base64.b64decode(_BIND_RESOLVER_QUERY_B64))
    rd = ev["requestData"]
    assert ev["dataType"] == "Message" and ev["dataTypeId"] == 1
    assert ev["messageType"] == "ResolverQuery" and ev["messageTypeId"] == 3
    assert ev["requestMessageSize"] == 54
    assert ev["queryZone"] == "com."
    assert rd["fullRcode"] == 0 and rd["rcodeName"] == "NoError"
    assert rd["header"] == {
        "id": 37634, "opcode": 0, "rcode": 0, "qr": 0, "aa": False,
        "tc": False, "rd": False, "ra": False, "ad": False, "cd": False,
        "qdCount": 1, "anCount": 0, "nsCount": 0, "arCount": 1,
    }
    assert rd["opt"]["do"] is True
    assert rd["opt"]["ednsVersion"] == 0
    assert rd["opt"]["extendedRcode"] == 0
    assert rd["opt"]["udpPayloadSize"] == 512
    assert rd["opt"]["options"] == [{
        "optCode": 10, "optName": "Cookie", "optValue": "7GMIAb3NWDM=",
    }]
    assert rd["question"] == [{
        "domainName": "facebook1.com.", "questionType": "A",
        "questionTypeId": 1, "class": "IN",
    }]
    assert ev["socketFamily"] == "INET6" and ev["socketProtocol"] == "UDP"
    assert ev["sourceAddress"] == "::" and ev["sourcePort"] == 46835
    assert ev["responseAddress"] == "2001:502:7094::30"
    assert ev["responsePort"] == 53
    assert ev["serverId"] == "james-Virtual-Machine"
    assert ev["serverVersion"] == "BIND 9.16.3"
    assert ev["time"] == 1_593_489_007_920_014_129
    assert ev["timePrecision"] == "ns"
    assert ev["timestamp"] == "2020-06-30T03:50:07.920014129Z"


def test_reference_bind_capture_lowercase_hostnames():
    """The reference's lowercase-hostnames vector (parser.rs
    test_parse_dnstap_data_lowercase_hostnames): a BIND 9.18 ClientResponse
    whose names are 'Vector.Dev.' raw and 'vector.dev.' lowercased."""
    import base64

    blob = base64.b64decode(
        "Cgw2NzNiNWZiZWI5MmESMkJJTkQgOS4xOC4yMS0xK3VidW50dTIyLjA0LjErZGVi"
        "LnN1cnkub3JnKzEtVWJ1bnR1cqkBCAYQARgBIgQKWQUeKgQKWQUqMMitAjg1YLXQ"
        "p68GbZ9tBw9ygwGInoGAAAEABAAAAAEGVmVjdG9yA0RldgAAAQABwAwAAQABAAAA"
        "PAAEEvVWOMAMAAEAAQAAADwABBL1VnnADAABAAEAAAA8AAQS9VYSwAwAAQABAAAA"
        "PAAEEvVWWQAAKQTQAAAAAAAcAAoAGERDbSN8uKngAQAAAGXp6DXs0fbpv0n9F3gB"
    )
    ev = decode_dnstap_frame(blob)
    assert ev["dataType"] == "Message" and ev["dataTypeId"] == 1
    assert ev["responseData"]["question"][0]["domainName"] == "Vector.Dev."
    assert ev["responseData"]["answers"][0]["domainName"] == "Vector.Dev."
    low = decode_dnstap_frame(blob, lowercase=True)
    assert low["responseData"]["question"][0]["domainName"] == "vector.dev."
    assert low["responseData"]["answers"][0]["domainName"] == "vector.dev."


def test_reference_bind_capture_ede_options():
    """The reference's EDE vector (parser.rs
    test_parse_dnstap_data_with_ede_options): DNSKEY Missing with the
    dnssec-failed.org extra text."""
    import base64

    blob = base64.b64decode(
        "ChVqYW1lcy1WaXJ0dWFsLU1hY2hpbmUSC0JJTkQgOS4xNi4zGgBy5wEIAxACGAEi"
        "EAAAAAAAAAAAAAAAAAAAAAAqECABBQJwlAAAAAAAAAAAADAw8+0CODVA7+zq9wVN"
        "MU3WNlI2kwIAAAABAAAAAAABCWZhY2Vib29rMQNjb20AAAEAAQAAKQIAAACAAAAM"
        "AAoACOxjCAG9zVgzWgUDY29tAGAAbQAAAAByZLM4AAAAAQAAAAAAAQJoNQdleGFt"
        "cGxlA2NvbQAABgABAAApBNABAUAAADkADwA1AAlubyBTRVAgbWF0Y2hpbmcgdGhl"
        "IERTIGZvdW5kIGZvciBkbnNzZWMtZmFpbGVkLm9yZy54AQ=="
    )
    ev = decode_dnstap_frame(blob)
    assert ev["responseData"]["opt"]["ede"] == [{
        "infoCode": 9, "purpose": "DNSKEY Missing",
        "extraText": "no SEP matching the DS found for dnssec-failed.org.",
    }]


def test_reference_bind_capture_update_message():
    """The reference's UPDATE vector (parser.rs
    test_parse_dnstap_data_with_update_message), value for value."""
    import base64

    blob = base64.b64decode(
        "ChVqYW1lcy1WaXJ0dWFsLU1hY2hpbmUSC0JJTkQgOS4xNi4zcmsIDhABGAEiBH8A"
        "AAEqBH8AAAEwrG44AEC+iu73BU14gfofUh1wi6gAAAEAAAAAAAAHZXhhbXBsZQNj"
        "b20AAAYAAWC+iu73BW0agDwvch1wi6gAAAEAAAAAAAAHZXhhbXBsZQNjb20AAAYA"
        "AXgB"
    )
    ev = decode_dnstap_frame(blob)
    assert ev["messageType"] == "UpdateResponse" and ev["messageTypeId"] == 14
    assert ev["requestMessageSize"] == 29 and ev["responseMessageSize"] == 29
    for section in ("requestData", "responseData"):
        d = ev[section]
        assert d["header"] == {"id": 28811, "opcode": 5, "rcode": 0,
                               "qr": 1, "zoCount": 1, "prCount": 0,
                               "upCount": 0, "adCount": 0}, section
        assert d["zone"] == {"zName": "example.com.", "zType": "SOA",
                             "zTypeId": 6, "zClass": "IN"}
        assert d["fullRcode"] == 0 and d["rcodeName"] == "NoError"
    assert ev["socketFamily"] == "INET" and ev["socketProtocol"] == "UDP"
    assert ev["sourceAddress"] == "127.0.0.1" and ev["sourcePort"] == 14124
    assert ev["responseAddress"] == "127.0.0.1" and ev["responsePort"] == 0
    assert ev["time"] == 1_593_541_950_792_494_106
    assert ev["timestamp"] == "2020-06-30T18:32:30.792494106Z"


def test_dnssec_and_caa_naptr_rdata_formats():
    """CAA / NAPTR / DS / DNSKEY rdata renderings
    (dns_message_parser.rs:626-700, format_ds_record,
    format_dnskey_record)."""
    head = struct.pack(">HHHHHH", 1, 0x8000, 0, 4, 0, 0)
    caa_val = b"ca.example.net"
    caa = _rr(encode_name("x.y"), 257, 1, 1,
              bytes([0x80, 5]) + b"issue" + caa_val)
    naptr_rd = (struct.pack(">HH", 100, 10)
                + bytes([1]) + b"u"
                + bytes([7]) + b"E2U+sip"
                + bytes([14]) + b'!^.*$!sip:a@b!'
                + encode_name("foo.example"))
    naptr = _rr(encode_name("x.y"), 35, 1, 1, naptr_rd)
    ds = _rr(encode_name("x.y"), 43, 1, 1,
             struct.pack(">HBB", 60485, 5, 1) + bytes.fromhex("2bb183af"))
    dnskey = _rr(encode_name("x.y"), 48, 1, 1,
                 struct.pack(">HBB", 0x0101, 3, 8) + b"\x01\x02\x03")
    msg = decode_dns_message(head + caa + naptr + ds + dnskey)
    r = [a["rData"] for a in msg["answers"]]
    assert r[0] == '1 issue "ca.example.net"'
    assert r[1] == '100 10 "u" "E2U+sip" "!^.*$!sip:a@b!" foo.example.'
    assert r[2] == "60485 5 1 2BB183AF"
    assert r[3] == "257 3 8 AQID"  # zone key + SEP → 257
    assert [a["recordType"] for a in msg["answers"]] == \
        ["CAA", "NAPTR", "DS", "DNSKEY"]


# ---------------------------------------------------------------------------
# adversarial bytes: the decoder's only failure mode is ValueError


def test_random_bytes_never_crash_decoders():
    """Malformed input must surface as the documented error channels —
    decode ValueError (→ NULL / error+rawData at the column seam) —
    never an unhandled exception type."""
    import random

    from vector_spark.functions.dnstap import (
        decode_dnstap_frame, fstrm_split)

    rng = random.Random(0xD15EA5E)
    for n in (0, 1, 2, 5, 11, 12, 13, 40, 200):
        for _ in range(200):
            blob = bytes(rng.randrange(256) for _ in range(n))
            for fn in (decode_dns_message, fstrm_split,
                       decode_dnstap_frame):
                try:
                    fn(blob)
                except ValueError:
                    pass  # the ONE documented failure mode


def test_mutated_valid_frame_never_crashes_parse(spark):
    """Bit-flipped copies of a VALID frame through the full Spark
    column path: every row yields JSON or NULL, the job never fails."""
    import json
    import random

    wire = encode_dns_query(7, "mutate.example.com", 1)
    good = encode_dnstap_frame(
        message_type=5, query_message=wire,
        query_address=socket.inet_aton("10.0.0.1"), query_port=9,
        query_time_sec=100,
    )
    rng = random.Random(42)
    rows = [(good,)]
    for _ in range(300):
        b = bytearray(good)
        for _ in range(rng.randrange(1, 4)):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        rows.append((bytes(b),))
    df = spark.createDataFrame(rows, "frame binary")
    out = df.select(parse_dnstap(F.col("frame")).alias("j")).collect()
    assert len(out) == 301
    ok = sum(1 for r in out if r["j"] is not None)
    assert ok >= 1  # the pristine frame always decodes
    for r in out:
        if r["j"] is not None:
            json.loads(r["j"])  # any non-null result is valid JSON


def test_reference_txt_rdata_vector():
    """The reference's TXT format vector
    (dns_message_parser.rs:1663-1674): chunks 'abc"def', 'gh\\i', '',
    'j' render as '"abc\\"def" "gh\\\\i" "" "j"'."""
    chunks = [b'abc"def', b"gh\\i", b"", b"j"]
    rdata = b"".join(bytes([len(c)]) + c for c in chunks)
    head = struct.pack(">HHHHHH", 1, 0x8000, 0, 1, 0, 0)
    msg = decode_dns_message(head + _rr(encode_name("t.x"), 16, 1, 1, rdata))
    assert msg["answers"][0]["rData"] == r'"abc\"def" "gh\\i" "" "j"'
