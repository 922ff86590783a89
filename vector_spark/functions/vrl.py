"""VRL scalar-function surface → Spark Column helpers.

The reference executes VRL per event (remap transform,
/root/reference/src/transforms/remap.rs:442-465; registry =
vrl::stdlib::all() + vector functions, lib/vector-vrl/functions/src/
lib.rs:28-45).  Each function here is the Spark-native equivalent —
built-in `pyspark.sql.functions` (JVM-side, codegen'd) wherever one
exists; nothing row-at-a-time.

Fallibility: VRL's `!` / `?? default` error handling maps to SQL null
semantics — a failed parse yields null, recovered with
:func:`coalesce_or` (the `??` analogue).  Category names follow
website/cue/reference/remap/functions.cue:31-54.
"""

from __future__ import annotations

import os
import socket

import pandas as pd
from pyspark.sql import Column, functions as F

# --------------------------------------------------------------------------
# Parse

from vector_spark.functions.grok import grok_to_regex  # noqa: F401
from vector_spark.functions.parse import (  # noqa: F401
    parse_key_value,
    regex_extract_struct,
)


def parse_json(col: Column, schema: str) -> Column:
    """VRL parse_json → from_json with an explicit schema."""
    return F.from_json(col, schema)


def get_json_field(col: Column, path: str) -> Column:
    return F.get_json_object(col, path)


def parse_regex(col: Column, pattern: str, fields: list[str]) -> Column:
    return regex_extract_struct(col, pattern, fields)


def parse_grok(col: Column, grok_pattern: str) -> Column:
    """Compile grok at the driver; evaluate as one regex pass."""
    regex, fields = grok_to_regex(grok_pattern)
    return regex_extract_struct(col, f"^{regex}$", fields)


def parse_csv(col: Column, schema: str, sep: str = ",") -> Column:
    return F.from_csv(col, schema, {"sep": sep})


SYSLOG_3164 = (
    r"^<(\d+)>([A-Z][a-z]{2} +\d+ \d{2}:\d{2}:\d{2}) (\S+) "
    r"([^:\[\s]+)(?:\[(\d+)\])?: (.*)$"
)


def parse_syslog(col: Column) -> Column:
    """RFC3164 syslog line → struct (priority split into facility/
    severity with integer arithmetic, as the syslog codec does —
    /root/reference/lib/codecs/src/decoding/format/syslog.rs)."""
    raw = regex_extract_struct(
        col, SYSLOG_3164,
        ["pri", "stamp", "hostname", "appname", "procid", "message"],
    )
    pri = raw.getField("pri").cast("int")
    return F.when(
        raw.isNotNull(),
        F.struct(
            (pri / 8).cast("int").alias("facility"),
            F.pmod(pri, F.lit(8)).alias("severity"),
            raw.getField("stamp").alias("timestamp"),
            raw.getField("hostname").alias("hostname"),
            raw.getField("appname").alias("appname"),
            raw.getField("procid").cast("int").alias("procid"),
            raw.getField("message").alias("message"),
        ),
    )


GLOG_REGEX = (
    r"^([IWEF])(\d{2})(\d{2}) (\d{2}:\d{2}:\d{2}\.\d+)\s+(\d+) "
    r"([^:]+):(\d+)\] (.*)$"
)
_GLOG_LEVELS = {"I": "info", "W": "warning", "E": "error", "F": "fatal"}


def parse_glog(col: Column) -> Column:
    """VRL parse_glog (google log / Kubernetes klog lines:
    ``I0817 10:00:00.123456 1234 file.go:123] message``) → struct."""
    raw = regex_extract_struct(
        col, GLOG_REGEX,
        ["lvl", "month", "day", "time", "thread_id", "file", "line",
         "message"],
    )
    level = F.lit(None).cast("string")
    for k, v in _GLOG_LEVELS.items():
        level = F.when(raw.getField("lvl") == k, v).otherwise(level)
    return F.when(
        raw.isNotNull(),
        F.struct(
            level.alias("level"),
            raw.getField("month").cast("int").alias("month"),
            raw.getField("day").cast("int").alias("day"),
            raw.getField("time").alias("time"),
            raw.getField("thread_id").cast("long").alias("id"),
            raw.getField("file").alias("file"),
            raw.getField("line").cast("int").alias("line"),
            raw.getField("message").alias("message"),
        ),
    )


#: Kubernetes klog shares the glog line format
parse_klog = parse_glog


#: SD capture matches one-or-more consecutive [..] elements (or '-'):
#: '[a x="1"][b y="2"] msg' keeps BOTH elements in structured_data
#: rather than leaking the second into message.
SYSLOG_5424 = (
    r"^<(\d+)>1 (\S+) (\S+) (\S+) (\S+) (\S+) ((?:\[.*?\])+|-) ?(.*)$"
)


def parse_syslog_5424(col: Column) -> Column:
    """RFC5424 structured syslog → struct (the syslog codec's modern
    format; facility/severity split like :func:`parse_syslog`;
    '-' nil values become null).  structured_data is kept as the raw
    string of all SD elements concatenated."""
    raw = regex_extract_struct(
        col, SYSLOG_5424,
        ["pri", "timestamp", "hostname", "appname", "procid", "msgid",
         "sd", "message"],
    )
    pri = raw.getField("pri").cast("int")
    nil = lambda c: F.when(c != "-", c)  # noqa: E731
    return F.when(
        raw.isNotNull(),
        F.struct(
            (pri / 8).cast("int").alias("facility"),
            F.pmod(pri, F.lit(8)).alias("severity"),
            F.to_timestamp(raw.getField("timestamp")).alias("timestamp"),
            nil(raw.getField("hostname")).alias("hostname"),
            nil(raw.getField("appname")).alias("appname"),
            nil(raw.getField("procid")).try_cast("int").alias("procid"),
            nil(raw.getField("msgid")).alias("msgid"),
            nil(raw.getField("sd")).alias("structured_data"),
            raw.getField("message").alias("message"),
        ),
    )


def parse_linux_authorization(col: Column) -> Column:
    """VRL parse_linux_authorization — auth.log lines are RFC3164
    syslog; same struct as :func:`parse_syslog`."""
    return parse_syslog(col)


URL_REGEX = r"^(\w+)://(?:([^:@/]+)(?::([^@/]+))?@)?([^:/?#]+)(?::(\d+))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"


def parse_url(col: Column) -> Column:
    return regex_extract_struct(
        col, URL_REGEX,
        ["scheme", "username", "password", "host", "port", "path", "query",
         "fragment"],
    )


_DURATION_FACTORS = [
    ("ns", 1e-9), ("us", 1e-6), ("ms", 1e-3), ("s", 1.0),
    ("m", 60.0), ("h", 3600.0), ("d", 86400.0),
]


def parse_duration(col: Column, unit: str = "s") -> Column:
    """'300ms' → seconds (then rescaled to ``unit``), like VRL
    parse_duration!(.field, unit)."""
    num = F.regexp_extract(col, r"^([0-9.]+)", 1).try_cast("double")
    u = F.regexp_extract(col, r"([a-z]+)$", 1)
    factor = F.lit(None).cast("double")
    for name, mult in _DURATION_FACTORS:
        factor = F.when(u == name, F.lit(mult)).otherwise(factor)
    target = dict(_DURATION_FACTORS)[unit]
    return num * factor / F.lit(target)


#: strftime → Spark datetime-pattern tokens (VRL formats timestamps
#: with chrono strftime; translating them lets reference configs run
#: verbatim).  Order matters: longest/compound first.
_STRFTIME_TO_SPARK = [
    ("%Y", "yyyy"), ("%y", "yy"), ("%m", "MM"), ("%d", "dd"),
    ("%e", "d"), ("%H", "HH"), ("%I", "hh"), ("%M", "mm"),
    ("%S", "ss"), ("%3f", "SSS"), ("%6f", "SSSSSS"), ("%f", "SSSSSS"),
    ("%b", "MMM"), ("%B", "MMMM"), ("%a", "EEE"), ("%A", "EEEE"),
    ("%j", "DDD"), ("%p", "a"), ("%z", "xx"), ("%:z", "xxx"),
    ("%Z", "zz"),
    ("%%", "%"),
    # %s (unix seconds) intentionally unsupported: use
    # to_unix_timestamp / from_unix_timestamp, not a format token
]


def strftime_to_spark(fmt: str) -> str:
    """Translate a strftime pattern (VRL parse_timestamp /
    format_timestamp) to a Spark datetime pattern."""
    out = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%":
            for tok, rep in _STRFTIME_TO_SPARK:
                if fmt.startswith(tok, i):
                    out.append(rep)
                    i += len(tok)
                    break
            else:
                raise ValueError(f"unsupported strftime token at {fmt[i:]!r}")
        elif fmt[i].isalpha():
            # literal letters must be quoted in Spark patterns
            j = i
            while j < len(fmt) and fmt[j].isalpha():
                j += 1
            out.append("'" + fmt[i:j] + "'")
            i = j
        else:
            out.append(fmt[i])
            i += 1
    return "".join(out)


def parse_timestamp(col: Column, fmt: str, *, strftime: bool = False) -> Column:
    """VRL parse_timestamp; pass ``strftime=True`` to use the VRL/chrono
    format language instead of Spark's."""
    return F.to_timestamp(col, strftime_to_spark(fmt) if strftime else fmt)


def parse_xml(col: Column, schema: str) -> Column:
    """VRL parse_xml → Spark 4 from_xml with an explicit schema (the
    Spark-native equivalent of VRL's XML→object conversion; used by the
    reference's own scaling case,
    regression/cases/scale_sync_only_8_cpu/vector/vector.yaml:47)."""
    return F.from_xml(col, schema)


# CEF header: CEF:version|vendor|product|device_version|sig_id|name|severity|ext
# pipes inside header fields are escaped as \| (ArcSight CEF spec).
_CEF_FIELD = r"((?:\\.|[^|\\])*)"
CEF_REGEX = (
    r"^(?:.*\s)?CEF:(\d+)\|" + r"\|".join([_CEF_FIELD] * 6) + r"\|(.*)$"
)
_CEF_HEADER = [
    "cef_version", "device_vendor", "device_product", "device_version",
    "device_event_class_id", "name", "severity",
]


def parse_cef(col: Column) -> Column:
    """VRL parse_cef: ArcSight Common Event Format → struct of the 7
    header fields + an `extensions` map.  Header unescaping and the
    space-lookahead extension split are all JVM regex — no UDF.
    Extension values may contain spaces; keys are `\\w.`-only, so the
    split boundary is ``' ' followed by key=``."""
    raw = regex_extract_struct(
        col, CEF_REGEX, _CEF_HEADER + ["_ext"]
    )
    unesc = lambda c: F.regexp_replace(c, r"\\([|\\])", r"$1")  # noqa: E731
    ext_pairs = F.split(raw.getField("_ext"), r" (?=[\w.\[\]]+=)")
    exts = F.map_from_entries(
        F.transform(
            F.filter(ext_pairs, lambda p: p.contains("=")),
            lambda p: F.struct(
                F.regexp_extract(p, r"^([^=]+)=", 1).alias("key"),
                F.regexp_replace(
                    F.regexp_extract(p, r"^[^=]+=(.*)$", 1),
                    r"\\([=\\])", r"$1",
                ).alias("value"),
            ),
        )
    )
    return F.when(
        raw.isNotNull(),
        F.struct(
            raw.getField("cef_version").cast("int").alias("cef_version"),
            *[unesc(raw.getField(f)).alias(f) for f in _CEF_HEADER[1:-1]],
            raw.getField("severity").alias("severity"),
            exts.alias("extensions"),
        ),
    )


def _cef_escape_header(c: Column) -> Column:
    # escape_special_chars(s, '|'): backslash first, then the pipe
    return F.regexp_replace(
        F.regexp_replace(c, r"\\", r"\\\\"), r"\|", r"\\|"
    )


def _cef_escape_ext(c: Column) -> Column:
    # escape_special_chars(s, '='): backslash first, then '='
    return F.regexp_replace(
        F.regexp_replace(c, r"\\", r"\\\\"), "=", r"\\="
    )


def encode_cef(
    name: Column,
    severity: Column,
    *,
    version: int = 0,
    device_vendor: str = "Datadog",
    device_product: str = "Vector",
    device_version: str = "0",
    device_event_class_id: str = "Telemetry Event",
    extensions: dict[str, Column] | None = None,
) -> Column:
    """CEF encoder
    (/root/reference/lib/codecs/src/encoding/format/cef.rs:292-345):
    ``CEF:v|vendor|product|device_version|class_id|name|severity`` with
    backslash+pipe escaping in header fields, backslash+equals escaping
    in extension values; empty/NULL extension values are SKIPPED;
    extensions render sorted by their formatted ``key=`` prefix (the
    reference sorts the formatted strings).  Device settings are
    config-time strings with the same defaults as the reference
    (cef.rs:17-24).  A NULL/out-of-range severity (must be 0..10) makes
    the whole result NULL — the Column rendering of the reference's
    serializer error, following the repo's NULL-on-invalid error
    convention."""
    dev = "|".join(
        s.replace("\\", "\\\\").replace("|", "\\|")
        for s in (device_vendor, device_product, device_version,
                  device_event_class_id)
    )
    sev = severity.cast("int")
    header = F.concat(
        F.lit(f"CEF:{version}|{dev}|"),
        _cef_escape_header(name.cast("string")),
        F.lit("|"),
        sev.cast("string"),
    )
    parts = []
    for k in sorted(extensions or {}, key=lambda k: k + "="):
        v = (extensions or {})[k].cast("string")
        parts.append(
            F.when(
                v.isNotNull() & (v != ""),
                F.concat(F.lit(f"{k}="), _cef_escape_ext(v)),
            )
        )
    if parts:
        exts = F.filter(
            F.array(*parts), lambda p: p.isNotNull()
        )
        tail = F.when(
            F.size(exts) > 0,
            F.concat(F.lit("|"), F.array_join(exts, " ")),
        ).otherwise(F.lit(""))
    else:
        tail = F.lit("")
    return F.when(
        sev.isNotNull() & (sev >= 0) & (sev <= 10),
        F.concat(header, tail),
    )


# ---------------------------------------------------------------------------
# syslog / GELF encoders (encoding/format/syslog.rs, gelf.rs)

#: kebab-case facility names → codes
#: (/root/reference/lib/codecs/src/encoding/format/syslog.rs:533-584)
SYSLOG_FACILITIES = {
    "kern": 0, "user": 1, "mail": 2, "daemon": 3, "auth": 4, "syslog": 5,
    "lpr": 6, "news": 7, "uucp": 8, "cron": 9, "authpriv": 10, "ftp": 11,
    "ntp": 12, "security": 13, "console": 14, "solaris-cron": 15,
    "local0": 16, "local1": 17, "local2": 18, "local3": 19, "local4": 20,
    "local5": 21, "local6": 22, "local7": 23,
}

#: severity names incl. strum aliases (syslog.rs:587-612)
SYSLOG_SEVERITIES = {
    "emergency": 0, "emerg": 0, "panic": 0, "alert": 1, "critical": 2,
    "crit": 2, "error": 3, "err": 3, "warning": 4, "warn": 4, "notice": 5,
    "informational": 6, "info": 6, "debug": 7,
}


def _syslog_code(col: Column | None, table: dict[str, int], default: int) -> Column:
    """Resolve a facility/severity column to its numeric code the way
    the reference's get_syslog_code does (syslog.rs:199-221): a name
    (case-insensitive) wins, else an in-range integer code, else the
    default (user / informational)."""
    if col is None:
        return F.lit(default)
    pairs: list[Column] = []
    for k, v in table.items():
        pairs += [F.lit(k), F.lit(v)]
    by_name = F.element_at(F.create_map(*pairs), F.lower(col.cast("string")))
    code = col.try_cast("int")
    in_range = code.isNotNull() & (code >= 0) & (code < max(table.values()) + 1)
    return F.coalesce(by_name, F.when(in_range, code), F.lit(default))


def _ascii_printable(c: Column, repl: str) -> Column:
    # RFC3164 sanitizers (syslog.rs:247-254): chars outside ' '..'~'
    return F.regexp_replace(c, r"[^ -~]", repl)


def _sd_name(c: Column) -> Column:
    # RFC5424 SD-ID / PARAM-NAME: printable ASCII 33-126 minus = ] "
    # (syslog.rs:257-264), invalid → '_'
    return F.regexp_replace(c, r"[^!-~]|[=\]\"]", "_")


def _sd_value(c: Column) -> Column:
    # escape_sd_value (syslog.rs:267-287): backslash first, then " and ]
    out = F.regexp_replace(c, r"\\", r"\\\\")
    out = F.regexp_replace(out, "\"", "\\\\\"")
    return F.regexp_replace(out, r"\]", r"\\]")


def _nil(c: Column | None, trunc: int | None = None) -> Column:
    if c is None:
        return F.lit("-")
    s = c.cast("string")
    if trunc:
        s = F.substring(s, 1, trunc)
    return F.coalesce(s, F.lit("-"))


def encode_syslog(
    message: Column,
    *,
    rfc: str = "rfc5424",
    facility: Column | None = None,
    severity: Column | None = None,
    app_name: Column | None = None,
    proc_id: Column | None = None,
    msg_id: Column | None = None,
    hostname: Column | None = None,
    timestamp: Column | None = None,
    structured_data: Column | None = None,
) -> Column:
    """Syslog encoder
    (/root/reference/lib/codecs/src/encoding/format/syslog.rs).

    rfc5424: ``<PRI>1 TIMESTAMP HOSTNAME APP PROCID MSGID SD [MSG]``
    with RFC3339 micros timestamps, NIL ``-`` for absent fields,
    char-limit truncation (app 48 / procid 128 / msgid 32,
    syslog.rs:128-137), and structured data rendered from a
    ``map<string, map<string,string>>`` column sorted by SD-ID with
    RFC5424 name sanitization + value escaping.

    rfc3164: ``<PRI>MMM dd HH:mm:ss HOSTNAME TAG[PID]: [MSG]`` with
    ASCII-printable sanitization of tag and message and the 32-char
    tag truncation that re-pins the trailing colon
    (syslog.rs:399-412); structured data is ignored.

    facility/severity accept a name (case-insensitive, incl. strum
    aliases) or a numeric code; unknown values fall back to
    user / informational like the reference.  A missing timestamp is
    encode-time ``now()`` (syslog.rs:172-177)."""
    fac = _syslog_code(facility, SYSLOG_FACILITIES, 1)
    sev = _syslog_code(severity, SYSLOG_SEVERITIES, 6)
    pri = F.concat(F.lit("<"), (fac * 8 + sev).cast("string"), F.lit(">"))
    ts = timestamp if timestamp is not None else F.current_timestamp()
    host = _nil(hostname)
    msg = F.coalesce(message.cast("string"), F.lit(""))
    app = app_name.cast("string") if app_name is not None else F.lit("vector")
    app = F.coalesce(app, F.lit("vector"))

    if rfc == "rfc3164":
        app3 = _ascii_printable(app, "_")
        stamp = F.concat(
            F.date_format(ts, "MMM "),
            F.lpad(F.dayofmonth(ts).cast("string"), 2, " "),
            F.date_format(ts, " HH:mm:ss"),
        )
        if proc_id is not None:
            pid = _ascii_printable(proc_id.cast("string"), "_")
            tag = F.when(
                pid.isNotNull(),
                F.concat(app3, F.lit("["), pid, F.lit("]:")),
            ).otherwise(F.concat(app3, F.lit(":")))
        else:
            tag = F.concat(app3, F.lit(":"))
        tag = F.when(
            F.length(tag) > 32,
            F.concat(F.substring(tag, 1, 31), F.lit(":")),
        ).otherwise(tag)
        body = F.when(msg != "", _ascii_printable(msg, " ")).otherwise(F.lit(""))
        return F.concat(pri, stamp, F.lit(" "), host, F.lit(" "), tag,
                        F.lit(" "), body)

    if rfc != "rfc5424":
        raise ValueError(f"unknown syslog rfc {rfc!r}")
    fmt5424 = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"
    # a NULL timestamp value falls back to encode-time now(), the
    # get_timestamp behavior (syslog.rs:172-177)
    stamp = F.coalesce(
        F.date_format(ts, fmt5424),
        F.date_format(F.current_timestamp(), fmt5424),
    )
    if structured_data is not None:
        # sort SD-IDs (a struct holding a map is not orderable, so sort
        # the key array and look values back up) — BTreeMap order
        elems = F.transform(
            F.array_sort(F.map_keys(structured_data)),
            lambda k: F.concat(
                F.lit("["),
                F.substring(_sd_name(k), 1, 32),
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(
                            F.map_entries(F.element_at(structured_data, k))
                        ),
                        lambda p: F.concat(
                            F.lit(" "), _sd_name(p.getField("key")),
                            F.lit("=\""), _sd_value(p.getField("value")),
                            F.lit("\""),
                        ),
                    ),
                ),
                F.lit("]"),
            ),
        )
        sd = F.when(
            structured_data.isNotNull() & (F.size(structured_data) > 0),
            F.concat_ws("", elems),
        ).otherwise(F.lit("-"))
    else:
        sd = F.lit("-")
    head = F.concat_ws(
        " ", F.concat(pri, F.lit("1")), stamp, host,
        _nil(app, 48), _nil(proc_id, 128), _nil(msg_id, 32), sd,
    )
    return F.when(msg != "", F.concat(head, F.lit(" "), msg)).otherwise(head)


#: GELF spec version the encoder stamps (lib/codecs/src/gelf.rs)
GELF_VERSION = "1.1"

#: valid additional-field names: word chars, dots, dashes, '@'
#: (lib/codecs/src/gelf.rs:75-76)
_GELF_FIELD_RE = r"^[\w\.\-@]*$"


def _json_scalar(c: Column) -> Column:
    """Render one column as its JSON value (correct escaping/typing for
    any Spark type) by unwrapping a single-field to_json: strip the
    fixed 5-char ``{"v":`` prefix and the closing brace."""
    j = F.to_json(F.struct(c.alias("v")))
    return F.substring(j, 6, F.length(j) - 6)


def encode_gelf(
    host: Column,
    short_message: Column,
    *,
    timestamp: Column | None = None,
    level: Column | None = None,
    facility: Column | None = None,
    line: Column | None = None,
    file: Column | None = None,
    full_message: Column | None = None,
    additional: dict[str, Column] | None = None,
) -> Column:
    """GELF encoder
    (/root/reference/lib/codecs/src/encoding/format/gelf.rs):
    renders the event as a GELF 1.1 JSON line.

    - ``version``/``host``/``short_message`` are required; a NULL host
      or short_message makes the result NULL (the serializer error
      under the repo's NULL-on-invalid convention).
    - a Timestamp column becomes the GELF numeric timestamp: integer
      seconds when the millis are whole seconds, else
      ``seconds.millis`` with trailing zeros trimmed — the encoder's
      int-vs-float branch (gelf.rs:205-221).
    - additional fields are validated against the reference's
      field-name pattern and get the ``_`` prefix prepended when
      missing (gelf.rs:233-252) — both at driver time, since batch
      column names are static.
    - keys serialize in sorted order (the reference's event map is a
      BTreeMap)."""
    frags: dict[str, Column] = {
        "version": _json_scalar(F.lit(GELF_VERSION)),
        "host": _json_scalar(host.cast("string")),
        "short_message": _json_scalar(short_message.cast("string")),
    }
    if timestamp is not None:
        millis = F.round(timestamp.cast("double") * 1000).cast("long")
        frac = F.regexp_replace(
            F.lpad(F.pmod(millis, F.lit(1000)).cast("string"), 3, "0"),
            "0+$", "",
        )
        secs = F.floor(millis / 1000).cast("long").cast("string")
        frags["timestamp"] = F.when(
            F.pmod(millis, F.lit(1000)) == 0, secs
        ).otherwise(F.concat(secs, F.lit("."), frac))
    if level is not None:
        # the reference errors on non-integer levels; NULL (dropped
        # field) is the Column rendering of that error
        frags["level"] = _json_scalar(level.try_cast("int"))
    if facility is not None:
        frags["facility"] = _json_scalar(facility.cast("string"))
    if line is not None:
        frags["line"] = _json_scalar(line)
    if file is not None:
        frags["file"] = _json_scalar(file.cast("string"))
    if full_message is not None:
        frags["full_message"] = _json_scalar(full_message.cast("string"))
    import re as _re

    for name, col in (additional or {}).items():
        if not _re.match(_GELF_FIELD_RE, name):
            raise ValueError(
                f"invalid GELF additional field name {name!r} "
                f"(must match {_GELF_FIELD_RE})"
            )
        frags["_" + name if not name.startswith("_") else name] = (
            _json_scalar(col)
        )
    # a NULL value yields an empty fragment (to_json omits null struct
    # fields) — drop the field, the JSON rendering of "absent"
    parts = [
        F.when(
            frags[k].isNotNull() & (frags[k] != ""),
            F.concat(F.lit(f'"{k}":'), frags[k]),
        )
        for k in sorted(frags)
    ]
    body = F.array_join(F.filter(F.array(*parts), lambda p: p.isNotNull()), ",")
    return F.when(
        host.isNotNull() & short_message.isNotNull(),
        F.concat(F.lit("{"), body, F.lit("}")),
    )


#: AWS VPC flow log v2 default format (14 space-separated fields)
VPC_FLOW_SCHEMA = (
    "version int, account_id string, interface_id string, srcaddr string, "
    "dstaddr string, srcport int, dstport int, protocol int, packets long, "
    "bytes long, start long, `end` long, action string, log_status string"
)


def parse_aws_vpc_flow_log(col: Column, schema: str = VPC_FLOW_SCHEMA) -> Column:
    """VRL parse_aws_vpc_flow_log (default v2 format) — one from_csv
    with space separator; '-' placeholders become null via nullValue."""
    return F.from_csv(col, schema, {"sep": " ", "nullValue": "-"})


#: nginx 'combined' access-log format
NGINX_COMBINED_REGEX = (
    r'^(\S+) - (\S+) \[([^\]]+)\] "([^"]*)" (\d+) (\d+) "([^"]*)" "([^"]*)"'
)


def parse_nginx_log(col: Column) -> Column:
    """VRL parse_nginx_log(format: 'combined') → struct; '-' user/refs
    map to null like the reference."""
    raw = regex_extract_struct(
        col, NGINX_COMBINED_REGEX,
        ["client", "user", "timestamp", "request", "status", "size",
         "referer", "agent"],
    )
    dash_null = lambda c: F.when(c != "-", c)  # noqa: E731
    return F.when(
        raw.isNotNull(),
        F.struct(
            raw.getField("client").alias("client"),
            dash_null(raw.getField("user")).alias("user"),
            raw.getField("timestamp").alias("timestamp"),
            raw.getField("request").alias("request"),
            raw.getField("status").cast("int").alias("status"),
            raw.getField("size").cast("long").alias("size"),
            dash_null(raw.getField("referer")).alias("referer"),
            dash_null(raw.getField("agent")).alias("agent"),
        ),
    )


def parse_apache_log(col: Column) -> Column:
    """VRL parse_apache_log(format: 'common'/'combined' prefix) — the
    shared anchored grok-compiled regex from the parse stage."""
    from vector_spark.functions.parse import APACHE_ANCHORED, APACHE_FIELDS

    return regex_extract_struct(col, APACHE_ANCHORED, APACHE_FIELDS)


#: VRL parse_common_log — alias; the CLF fields are the apache set
parse_common_log = parse_apache_log


def parse_tokens(col: Column) -> Column:
    """VRL parse_tokens: whitespace-separated tokens, with
    double-quoted strings and [bracketed] segments kept as single
    tokens (delimiters stripped, '-' → null) → array<string>."""
    toks = F.regexp_extract_all(
        col, F.lit(r'("[^"]*"|\[[^\]]*\]|[^\s]+)'), 1
    )
    return F.transform(
        toks,
        lambda t: F.when(t == "-", F.lit(None)).otherwise(
            F.when(
                (t.startswith('"') & t.endswith('"'))
                | (t.startswith("[") & t.endswith("]")),
                t.substr(F.lit(2), F.length(t) - 2),
            ).otherwise(t)
        ),
    )


def parse_logfmt(col: Column) -> Column:
    """VRL parse_logfmt — key=value pairs to a map."""
    return parse_key_value(col)


_BYTES_UNITS = [
    ("TiB", 1024**4), ("GiB", 1024**3), ("MiB", 1024**2), ("KiB", 1024),
    ("TB", 10**12), ("GB", 10**9), ("MB", 10**6), ("kB", 10**3),
    ("B", 1),
]


def parse_bytes(col: Column) -> Column:
    """VRL parse_bytes: '1.5MiB' → 1572864 (binary + SI units,
    longest-suffix-first so 'MiB' never matches as 'B')."""
    num = F.regexp_extract(col, r"^([0-9.]+)", 1).try_cast("double")
    unit = F.regexp_extract(col, r"([A-Za-z]+)$", 1)
    factor = F.lit(None).cast("double")
    for name, mult in _BYTES_UNITS:
        factor = F.when(unit == name, F.lit(float(mult))).otherwise(factor)
    return (num * factor).cast("long")


def parse_user_agent(col: Column) -> Column:
    """VRL parse_user_agent (fast mode): browser/os/device families via
    ordered regex alternatives — a Column-only re-expression of the
    common woothee rules, not a full UA database."""
    first = lambda *rules: _first_match(col, rules)  # noqa: E731
    browser = first(
        (r"firefox/([\d.]+)", "Firefox", 1),
        (r"edg(?:e|a|ios)?/([\d.]+)", "Edge", 1),
        (r"(?:opr|opera)/([\d.]+)", "Opera", 1),
        (r"(?:chrome|crios)/([\d.]+)", "Chrome", 1),
        (r"version/([\d.]+).*safari", "Safari", 1),
        (r"msie ([\d.]+)", "IE", 1),
        (r"curl/([\d.]+)", "curl", 1),
        (r"bot|crawler|spider", "Bot", None),
    )
    os_fam = first(
        (r"windows nt ([\d.]+)", "Windows", 1),
        (r"mac os x ([\d_.]+)", "macOS", 1),
        (r"android ([\d.]+)", "Android", 1),
        (r"(?:iphone|cpu) os ([\d_]+)", "iOS", 1),
        (r"linux", "Linux", None),
    )
    lower = F.lower(col)
    device = (
        F.when(lower.rlike(r"bot|crawler|spider|curl"), "crawler")
        .when(lower.rlike(r"mobile|iphone|android.*mobile"), "smartphone")
        .when(lower.rlike(r"ipad|tablet"), "tablet")
        .otherwise("pc")
    )
    return F.struct(
        browser.getField("family").alias("browser_family"),
        browser.getField("version").alias("browser_version"),
        os_fam.getField("family").alias("os_family"),
        os_fam.getField("version").alias("os_version"),
        device.alias("device_category"),
    )


def _first_match(col: Column, rules) -> Column:
    """First regex rule that matches wins → struct(family, version);
    version = the named capture group, '_' normalized to '.'."""
    lowered = F.lower(col)
    out = F.lit(None).cast("struct<family:string,version:string>")
    for pattern, family, vgroup in reversed(list(rules)):
        ver = (
            F.nullif(
                F.regexp_replace(
                    F.regexp_extract(lowered, pattern, vgroup), "_", "."
                ),
                F.lit(""),
            )
            if vgroup is not None
            else F.lit(None).cast("string")
        )
        hit = F.struct(F.lit(family).alias("family"), ver.alias("version"))
        out = F.when(lowered.rlike(pattern), hit).otherwise(out)
    return out


# --------------------------------------------------------------------------
# Coerce


# VRL coercions are fallible (`to_int!` / `?? default`): malformed input
# yields null, not an ANSI cast error — hence try_cast.
def to_int(col: Column) -> Column:
    return col.try_cast("long")


def to_float(col: Column) -> Column:
    return col.try_cast("double")


def to_bool(col: Column) -> Column:
    return col.try_cast("boolean")


def to_string(col: Column) -> Column:
    return col.cast("string")


def to_timestamp(col: Column) -> Column:
    return col.try_cast("timestamp")


def to_unix_timestamp(col: Column) -> Column:
    return F.unix_timestamp(col)


def coalesce_or(col: Column, default) -> Column:
    """the `?? default` operator."""
    return F.coalesce(col, F.lit(default))


# --------------------------------------------------------------------------
# Event / Object / Path


def del_fields(df, *cols: str):
    """VRL del(.field) — column drop."""
    return df.drop(*cols)


def get_path(col: Column, path: list) -> Column:
    """VRL get(value, path): walk struct fields / map keys / array
    indices (ints are 0-based array positions, like VRL)."""
    out = col
    for p in path:
        if isinstance(p, int):
            out = F.element_at(out, p + 1)
        else:
            # getField resolves on structs AND maps (GetMapValue)
            out = out.getField(p)
    return out


def map_contains_key(col: Column, key) -> Column:
    """exists on a map key (VRL exists(.attrs.key))."""
    return F.array_contains(F.map_keys(col), key)


def exists(col: Column) -> Column:
    return col.isNotNull()


def merge_structs(a: Column, b: Column, fields: list[str]) -> Column:
    """VRL merge(a, b): b's non-null fields win."""
    return F.struct(
        *[
            F.coalesce(b.getField(f), a.getField(f)).alias(f)
            for f in fields
        ]
    )


def flatten_struct(df, struct_col: str):
    """VRL flatten — struct fields to top level."""
    others = [c for c in df.columns if c != struct_col]
    return df.select(*others, f"{struct_col}.*")


def unnest(df, array_col: str):
    """VRL unnest — one row per array element (explode)."""
    return df.withColumn(array_col, F.explode(array_col))


def compact(col: Column) -> Column:
    """VRL compact on arrays — drop nulls."""
    return F.array_compact(col)


# --------------------------------------------------------------------------
# String

split = F.split
join = F.concat_ws  # join(sep, array)
replace = F.regexp_replace
downcase = F.lower
upcase = F.upper


def contains(col: Column, sub: str) -> Column:
    return col.contains(sub)


def starts_with(col: Column, sub: str) -> Column:
    return col.startswith(sub)


def ends_with(col: Column, sub: str) -> Column:
    return col.endswith(sub)


def truncate(col: Column, limit: int, suffix: str = "") -> Column:
    out = F.substring(col, 1, limit)
    if suffix:
        out = F.when(F.length(col) > limit, F.concat(out, F.lit(suffix))).otherwise(col)
    return out


def strip_whitespace(col: Column) -> Column:
    return F.trim(col)


def match(col: Column, pattern: str) -> Column:
    return col.rlike(pattern)


ANSI_ESCAPE_REGEX = r"\x1B(?:[@-Z\\-_]|\[[0-?]*[ -/]*[@-~])"


def strip_ansi_escape_codes(col: Column) -> Column:
    """VRL strip_ansi_escape_codes — CSI/escape sequences removed."""
    return F.regexp_replace(col, ANSI_ESCAPE_REGEX, "")


#: built-in redact patterns (VRL redact filters)
REDACT_PATTERNS = {
    "us_social_security_number": r"\b\d{3}-\d{2}-\d{4}\b",
    "credit_card": r"\b(?:\d[ -]?){13,16}\b",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def redact(col: Column, filters: list[str], replacement: str = "[REDACTED]") -> Column:
    """VRL redact(value, filters: [...]): built-in pattern names or raw
    regex strings, each replaced globally."""
    out = col
    for f in filters:
        pattern = REDACT_PATTERNS.get(f, f)
        out = F.regexp_replace(out, pattern, replacement)
    return out


def slugify(col: Column) -> Column:
    return F.regexp_replace(
        F.regexp_replace(F.lower(col), r"[^a-z0-9]+", "-"), r"(^-|-$)", ""
    )


# --------------------------------------------------------------------------
# Array / Enumerate


def includes(col: Column, value) -> Column:
    return F.array_contains(col, value)


def filter_array(col: Column, predicate) -> Column:
    return F.filter(col, predicate)


def map_values(col: Column, fn) -> Column:
    return F.transform(col, fn)


def push(col: Column, value) -> Column:
    return F.concat(col, F.array(F.lit(value)))


def append(a: Column, b: Column) -> Column:
    return F.concat(a, b)


def unique(col: Column) -> Column:
    return F.array_distinct(col)


length = F.size


def tally(col: Column) -> Column:
    """VRL tally: array → map of value → occurrence count (pure
    higher-order functions: distinct values, then a count fold each)."""
    distinct = F.array_distinct(col)
    return F.map_from_entries(
        F.transform(
            distinct,
            lambda v: F.struct(
                v.alias("key"),
                F.size(F.filter(col, lambda x: x == v)).alias("value"),
            ),
        )
    )


def tally_value(col: Column, value) -> Column:
    """VRL tally_value: occurrences of one value in an array."""
    return F.size(F.filter(col, lambda x: x == F.lit(value)))


def sieve(col: Column, pattern: str, replacement: str = "") -> Column:
    """VRL sieve: KEEP only substrings matching the pattern; everything
    else becomes ``replacement`` (inverse of regexp_replace) — one
    regexp_extract_all + array_join."""
    return F.array_join(
        F.regexp_extract_all(col, F.lit(f"({pattern})")), replacement
    )


# --------------------------------------------------------------------------
# Cryptography / Checksum / Random

md5 = F.md5
sha1 = F.sha1
sha2 = F.sha2
crc32 = F.crc32


def sha3(col: Column, variant: str = "SHA3-512") -> Column:
    """VRL sha3 (default SHA3-512) — hashlib via an Arrow-batched
    kernel; Spark has sha2 built in but no sha3 expression."""
    import hashlib

    algo = variant.replace("-", "_").lower()  # SHA3-256 -> sha3_256
    if algo not in ("sha3_224", "sha3_256", "sha3_384", "sha3_512"):
        raise ValueError(f"unknown sha3 variant {variant!r}")

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _udf(s):
        h = getattr(hashlib, algo)
        return s.map(
            lambda b: None if b is None else h(bytes(b)).hexdigest()
        )

    return _udf(col.cast("binary"))


#: VRL cipher name -> (Spark aes mode, padding) — the AES subset of
#: vrl::stdlib encrypt/decrypt (the reference's other ciphers —
#: ChaCha20Poly1305 etc. — have no JVM builtin; AES-GCM/CBC/ECB cover
#: the overwhelmingly common configs)
_AES_MODES = {
    "AES-256-GCM": ("GCM", "NONE"),
    "AES-128-GCM": ("GCM", "NONE"),
    "AES-256-CBC-PKCS7": ("CBC", "PKCS"),
    "AES-128-CBC-PKCS7": ("CBC", "PKCS"),
    "AES-256-ECB-PKCS7": ("ECB", "PKCS"),
    "AES-128-ECB-PKCS7": ("ECB", "PKCS"),
}


def encrypt(col: Column, algorithm: str, key: str, iv: str | None = None) -> Column:
    """VRL encrypt(plaintext, algorithm, key[, iv]) → binary ciphertext,
    JVM-side via Spark's aes_encrypt (no Python in the path)."""
    if algorithm not in _AES_MODES:
        raise ValueError(
            f"unsupported cipher {algorithm!r}; have {sorted(_AES_MODES)}"
        )
    mode, padding = _AES_MODES[algorithm]
    args = [col.cast("binary"), F.lit(key.encode()), F.lit(mode), F.lit(padding)]
    if iv is not None:
        args.append(F.lit(iv.encode()))
    return F.aes_encrypt(*args)


def decrypt(col: Column, algorithm: str, key: str) -> Column:
    """VRL decrypt(ciphertext, algorithm, key) → string plaintext
    (try-variant: malformed input yields null, like `decrypt!` without
    the abort)."""
    if algorithm not in _AES_MODES:
        raise ValueError(
            f"unsupported cipher {algorithm!r}; have {sorted(_AES_MODES)}"
        )
    mode, padding = _AES_MODES[algorithm]
    return F.try_aes_decrypt(
        col.cast("binary"), F.lit(key.encode()), F.lit(mode), F.lit(padding)
    ).cast("string")


# ---------------------------------------------------------------------------
# event metadata: secrets + semantic meaning
# (the Vector-specific VRL registry additions —
#  /root/reference/lib/vector-vrl/functions/src/lib.rs:28-45)

def get_secret(secrets: Column, key: str) -> Column:
    """VRL get_secret: read one entry from the event's secrets map
    column (map<string,string>); null when absent — matching VRL's
    null return for an unset secret."""
    return F.element_at(secrets, F.lit(key))


def set_secret(secrets: Column, key: str, value: Column | str) -> Column:
    """VRL set_secret: upsert into the secrets map.  The existing key
    is filtered out first so map_concat never sees a duplicate (Spark's
    default mapKeyDedupPolicy=EXCEPTION); a null map is treated as
    empty."""
    v = value if isinstance(value, Column) else F.lit(value)
    base = F.coalesce(
        secrets, F.create_map().cast("map<string,string>")
    )
    return F.map_concat(
        F.map_filter(base, lambda k, _: k != F.lit(key)),
        F.create_map(F.lit(key), v),
    )


def remove_secret(secrets: Column, key: str) -> Column:
    """VRL remove_secret: drop one key from the secrets map."""
    base = F.coalesce(
        secrets, F.create_map().cast("map<string,string>")
    )
    return F.map_filter(base, lambda k, _: k != F.lit(key))


#: semantic-meaning registry: meaning name → column path.  Vector
#: attaches meanings at config load (log_schema / semantic meaning
#: definitions) and set_semantic_meaning mutates the global definition;
#: the batch analogue is a driver-side registry resolved to Columns.
_SEMANTIC_MEANINGS: dict[str, str] = {}


def set_semantic_meaning(
    meaning: str, path: str, registry: dict[str, str] | None = None
) -> None:
    """VRL set_semantic_meaning: bind a meaning name to an event path
    (config-time metadata, not a per-row operation).  Pass ``registry``
    to scope bindings per pipeline instead of the module default."""
    (registry if registry is not None else _SEMANTIC_MEANINGS)[meaning] = path


def semantic_col(
    meaning: str, registry: dict[str, str] | None = None
) -> Column:
    """Resolve a registered semantic meaning to its Column."""
    reg = registry if registry is not None else _SEMANTIC_MEANINGS
    if meaning not in reg:
        raise ValueError(f"semantic meaning {meaning!r} is not defined")
    return F.col(reg[meaning])


def _ruby_hash_to_json(s: str | None) -> str | None:
    """String-aware Ruby-hash → JSON rewrite: quoted spans pass through
    untouched (single-quoted ones re-escaped as JSON), `:sym =>` /
    `=>` / bare `:sym` / `nil` rewrite only OUTSIDE strings.  A
    context-free regex rewrite corrupts any value containing '=>'."""
    import json as _json

    if s is None:
        return None
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == '"':
            j = i + 1
            while j < n and s[j] != '"':
                j += 2 if s[j] == "\\" else 1
            out.append(s[i : j + 1])
            i = j + 1
            continue
        if c == "'":
            j = i + 1
            buf: list[str] = []
            while j < n and s[j] != "'":
                # ruby single-quote escapes: only \' and \\
                if s[j] == "\\" and j + 1 < n and s[j + 1] in ("'", "\\"):
                    buf.append(s[j + 1])
                    j += 2
                else:
                    buf.append(s[j])
                    j += 1
            out.append(_json.dumps("".join(buf)))
            i = j + 1
            continue
        if c == ":" and i + 1 < n and (s[i + 1].isalpha() or s[i + 1] == "_"):
            j = i + 1
            while j < n and (s[j].isalnum() or s[j] == "_"):
                j += 1
            sym = s[i + 1 : j]
            k = j
            while k < n and s[k] in " \t":
                k += 1
            if s[k : k + 2] == "=>":
                out.append(f'"{sym}":')
                i = k + 2
            else:
                out.append(f'"{sym}"')
                i = j
            continue
        if s[i : i + 2] == "=>":
            out.append(":")
            i += 2
            continue
        if (
            s[i : i + 3] == "nil"
            and (i + 3 == n or not (s[i + 3].isalnum() or s[i + 3] == "_"))
            and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
        ):
            out.append("null")
            i += 3
            continue
        out.append(c)
        i += 1
    return "".join(out)


def parse_ruby_hash(col: Column, schema: str, engine: str = "exact") -> Column:
    """VRL parse_ruby_hash: ``{"k" => "v", :sym => 1}`` → struct.

    ``engine="exact"`` (default): string-aware tokenizer as an
    Arrow-batched pandas UDF — quoted values containing ``=>`` or
    ``:word`` survive, single-quoted Ruby strings are handled.
    ``engine="jvm"``: the original pure-regexp rewrite (one JVM
    expression, no Python) — faster, but context-free: it also
    rewrites rocket syntax INSIDE string values, so use it only on
    inputs whose values can't contain ``=>``."""
    if engine == "jvm":
        json_ish = F.regexp_replace(col, r":(\w+)\s*=>", '"$1":')
        json_ish = F.regexp_replace(json_ish, r"=>", ":")
        json_ish = F.regexp_replace(json_ish, r"\bnil\b", "null")
        return F.from_json(json_ish, schema)

    @F.pandas_udf("string")
    def _rewrite(vals: pd.Series) -> pd.Series:
        return vals.map(_ruby_hash_to_json)

    return F.from_json(_rewrite(col), schema)


#: public-suffix entries beyond single-label TLDs needed by
#: parse_etld.  Single labels (com/org/...) need no table: the etld is
#: the last label.  This mirrors the high-traffic multi-label entries
#: of the public suffix list; extend via the `extra` parameter.
_MULTI_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "com.tr", "com.ar", "co.za", "com.sg",
    "github.io", "gitlab.io", "pages.dev", "s3.amazonaws.com",
)


def parse_etld(
    col: Column, plus_parts: int = 0, extra: tuple[str, ...] = ()
) -> Column:
    """VRL parse_etld: effective TLD (+N registrable parts) of a
    hostname, using the built-in multi-label suffix table + single-label
    fallback.  Pure Column expressions (array ops over the split
    hostname)."""
    suffixes = tuple(_MULTI_LABEL_SUFFIXES) + tuple(extra)
    parts = F.split(F.lower(col), r"\.")
    n = F.size(parts)
    two = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    three = F.when(
        n >= 3,
        F.concat_ws(
            ".", F.element_at(parts, -3), F.element_at(parts, -2),
            F.element_at(parts, -1),
        ),
    )
    etld_len = (
        F.when(three.isin(*suffixes), F.lit(3))
        .when(two.isin(*suffixes), F.lit(2))
        .otherwise(F.lit(1))
    )
    take = F.least(etld_len + F.lit(plus_parts), n)
    # length must be `take`, not int-max: slice overflows start+length
    return F.concat_ws(".", F.slice(parts, n - take + 1, take))


def hmac_sha(col: Column, key: str, algorithm: str = "sha256") -> Column:
    """VRL hmac(value, key) — hex digest (compose with encode_base64 /
    encode_base16 like VRL does for other encodings)."""
    import hashlib
    import hmac as _hmac

    if algorithm not in ("sha1", "sha224", "sha256", "sha384", "sha512"):
        raise ValueError(f"unknown hmac algorithm {algorithm!r}")
    kb = key.encode()

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _udf(s):
        return s.map(
            lambda b: None
            if b is None
            else _hmac.new(kb, bytes(b), getattr(hashlib, algorithm)).hexdigest()
        )

    return _udf(col.cast("binary"))


def community_id(
    saddr: Column,
    daddr: Column,
    sport: Column,
    dport: Column,
    *,
    proto: int = 6,
    seed: int = 0,
) -> Column:
    """Zeek community-id flow hash (the public spec: version 1,
    base64(sha1(seed . saddr . daddr . proto . 0 . sport . dport))
    over the ORDERED endpoint tuple, so both directions of a flow get
    the same id) — used to correlate flow logs across tools.  IPv4
    only (the engine's IP arithmetic scope); pure Column expressions.
    """
    s_long, d_long = ip_to_long(saddr), ip_to_long(daddr)
    # canonical order: (lower endpoint, port) first
    flip = (s_long > d_long) | ((s_long == d_long) & (sport > dport))
    a_ip = F.when(flip, d_long).otherwise(s_long)
    b_ip = F.when(flip, s_long).otherwise(d_long)
    a_pt = F.when(flip, dport).otherwise(sport).cast("int")
    b_pt = F.when(flip, sport).otherwise(dport).cast("int")

    def be16(c: Column) -> Column:
        return F.concat(
            _byte(c.cast("int") / 256), _byte(F.pmod(c.cast("int"), F.lit(256)))
        )

    def be32(c: Column) -> Column:
        return F.concat(
            _byte(c / 16777216), _byte(F.pmod((c / 65536).cast("long"), F.lit(256))),
            _byte(F.pmod((c / 256).cast("long"), F.lit(256))),
            _byte(F.pmod(c, F.lit(256))),
        )

    payload = F.concat(
        be16(F.lit(seed)), be32(a_ip), be32(b_ip),
        _byte(F.lit(proto)), _byte(F.lit(0)),
        be16(a_pt), be16(b_pt),
    )
    digest = F.sha1(payload)
    return F.concat(F.lit("1:"), F.base64(F.unhex(digest)))


def _byte(c: Column) -> Column:
    """One byte as binary from a 0-255 numeric column."""
    return F.unhex(F.lpad(F.conv(c.cast("long").cast("string"), 10, 16), 2, "0"))


def uuid_v4() -> Column:
    """Nondeterministic, like VRL uuid_v4() — excluded from oracle
    checks by nature."""
    return F.expr("uuid()")


def uuid_v7(ts: Column | None = None) -> Column:
    """VRL uuid_v7: time-ordered UUID — 48-bit unix-millis prefix,
    version 7, variant 10, random tail (from uuid()'s entropy).
    Nondeterministic tail, like uuid_v4; the millis prefix is the
    sortable part."""
    millis = (
        (F.unix_millis(ts) if ts is not None
         else F.unix_millis(F.current_timestamp()))
        .cast("long")
    )
    hex12 = F.lpad(F.conv(millis.cast("string"), 10, 16), 12, "0")
    rnd = F.regexp_replace(F.expr("uuid()"), "-", "")
    return F.lower(
        F.concat_ws(
            "-",
            F.substring(hex12, 1, 8),
            F.substring(hex12, 9, 4),
            F.concat(F.lit("7"), F.substring(rnd, 1, 3)),
            F.concat(
                # variant bits 10xx: force the nibble into {8,9,a,b}
                F.element_at(
                    F.split(F.lit("8,9,a,b"), ","),
                    (F.ascii(F.substring(rnd, 4, 1)) % 4 + 1).cast("int"),
                ),
                F.substring(rnd, 5, 3),
            ),
            F.substring(rnd, 8, 12),
        )
    )


def random_float() -> Column:
    return F.rand()


# --------------------------------------------------------------------------
# Timestamp


def format_timestamp(col: Column, fmt: str, *, strftime: bool = False) -> Column:
    """VRL format_timestamp; ``strftime=True`` accepts the VRL/chrono
    format language (reference configs use strftime tokens)."""
    return F.date_format(col, strftime_to_spark(fmt) if strftime else fmt)


def now() -> Column:
    return F.current_timestamp()


# --------------------------------------------------------------------------
# Codec


def encode_json(col: Column) -> Column:
    return F.to_json(col)


def parse_cbor(col: Column) -> Column:
    """VRL parse_cbor: CBOR binary → JSON string of the decoded value
    (pair with from_json for a typed struct).  RFC 8949 decoder in
    functions/cbor.py — jar-free, Arrow-batched."""
    from vector_spark.functions.cbor import decode_cbor

    return decode_cbor(col)


def encode_cbor(col: Column) -> Column:
    """VRL encode_cbor: JSON string → CBOR binary."""
    from vector_spark.functions.cbor import encode_cbor as _enc

    return _enc(col)


def parse_proto(col: Column, registry_or_desc, message_type: str) -> Column:
    """VRL parse_proto(value, desc_file, message_type) — binary
    protobuf → typed struct via the descriptor-driven pure-Python codec
    (sources/protobuf.py).  ``registry_or_desc`` is a parsed registry,
    a path to a binary FileDescriptorSet, or a path to a .proto
    source."""
    from vector_spark.sources.protobuf import from_protobuf_py

    return from_protobuf_py(col, _proto_registry(registry_or_desc),
                            message_type)


def encode_proto(
    registry_or_desc, message_type: str, *cols: Column, field_names=None
) -> Column:
    """VRL encode_proto — named columns → binary protobuf message."""
    from vector_spark.sources.protobuf import encode_protobuf_py

    return encode_protobuf_py(
        _proto_registry(registry_or_desc), message_type, *cols,
        field_names=field_names,
    )


def _proto_registry(registry_or_desc) -> dict:
    if isinstance(registry_or_desc, dict):
        return registry_or_desc
    from vector_spark.sources.protobuf import (
        parse_descriptor_set, parse_proto_text,
    )

    path = str(registry_or_desc)
    if path.endswith(".proto"):
        with open(path) as fh:
            return parse_proto_text(fh.read())
    with open(path, "rb") as fh:
        return parse_descriptor_set(fh.read())


def encode_base64(col: Column) -> Column:
    return F.base64(col.cast("binary"))


def decode_base64(col: Column) -> Column:
    return F.unbase64(col).cast("string")


def encode_base64url(col: Column) -> Column:
    """URL-safe base64 (RFC 4648 §5): '+/' → '-_', padding stripped."""
    return F.regexp_replace(
        F.translate(F.base64(col.cast("binary")), "+/", "-_"), "=+$", ""
    )


def decode_base64url(col: Column) -> Column:
    restored = F.translate(col, "-_", "+/")
    pad = F.pmod(F.lit(4) - F.pmod(F.length(restored), F.lit(4)), F.lit(4))
    return F.unbase64(
        F.concat(restored, F.repeat(F.lit("="), pad.cast("int")))
    ).cast("string")


def _binary_pandas_udf(fn, name: str):
    """Arrow-batched binary→binary kernel: the escape hatch for codecs
    Spark has no built-in expression for.  pandas .map over a bytes
    Series — per-batch Python, never per-row Spark."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _udf(s):
        return s.map(lambda b: None if b is None else fn(bytes(b)))

    _udf.__name__ = name
    return _udf


def encode_gzip(col: Column) -> Column:
    """VRL encode_gzip — deterministic (mtime=0, fixed level) so
    round-trips and oracle hashes are stable."""
    import gzip as _gzip

    return _binary_pandas_udf(
        lambda b: _gzip.compress(b, compresslevel=6, mtime=0), "encode_gzip"
    )(col.cast("binary"))


def decode_gzip(col: Column) -> Column:
    import gzip as _gzip

    return _binary_pandas_udf(_gzip.decompress, "decode_gzip")(
        col.cast("binary")
    )


def encode_zlib(col: Column) -> Column:
    import zlib as _zlib

    return _binary_pandas_udf(
        lambda b: _zlib.compress(b, 6), "encode_zlib"
    )(col.cast("binary"))


def decode_zlib(col: Column) -> Column:
    import zlib as _zlib

    return _binary_pandas_udf(_zlib.decompress, "decode_zlib")(
        col.cast("binary")
    )


def _optional_codec(module: str, attr: str, direction: str):
    try:
        mod = __import__(module)
    except ImportError:
        raise RuntimeError(
            f"{direction}_{attr} requires the '{module}' package, which is "
            "not in this container; gzip/zlib are available"
        ) from None
    return mod


def decode_zstd(col: Column) -> Column:
    mod = _optional_codec("zstandard", "zstd", "decode")
    d = mod.ZstdDecompressor()
    return _binary_pandas_udf(d.decompress, "decode_zstd")(col.cast("binary"))


def decode_snappy(col: Column) -> Column:
    mod = _optional_codec("snappy", "snappy", "decode")
    return _binary_pandas_udf(mod.decompress, "decode_snappy")(
        col.cast("binary")
    )


# --------------------------------------------------------------------------
# IP (IPv4 arithmetic — no UDF)


def ip_to_long(col: Column) -> Column:
    o = F.split(col, r"\.")
    return (
        o.getItem(0).try_cast("long") * 16777216
        + o.getItem(1).try_cast("long") * 65536
        + o.getItem(2).try_cast("long") * 256
        + o.getItem(3).try_cast("long")
    )


#: VRL ip_aton — dotted quad → integer (alias of ip_to_long)
def ip_aton(col: Column) -> Column:
    return ip_to_long(col)


def ip_ntoa(col: Column) -> Column:
    """VRL ip_ntoa — integer → dotted quad."""
    n = col.cast("long")
    return F.concat_ws(
        ".",
        (n / 16777216).cast("long").cast("string"),
        F.pmod((n / 65536).cast("long"), F.lit(256)).cast("string"),
        F.pmod((n / 256).cast("long"), F.lit(256)).cast("string"),
        F.pmod(n, F.lit(256)).cast("string"),
    )


IPV4_REGEX = (
    r"^((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
    r"(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)$"
)
IPV6_REGEX = r"^([0-9A-Fa-f]{0,4}:){2,7}[0-9A-Fa-f]{0,4}$"


def is_ipv4(col: Column) -> Column:
    return F.coalesce(col.rlike(IPV4_REGEX), F.lit(False))


def is_ipv6(col: Column) -> Column:
    return F.coalesce(col.rlike(IPV6_REGEX) & ~col.rlike(IPV4_REGEX),
                      F.lit(False))


def encode_punycode(col: Column) -> Column:
    """VRL encode_punycode — IDNA hostname encoding (Python stdlib
    codec via an Arrow-batched kernel; no Spark builtin)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _udf(s):
        def enc(v):
            if v is None:
                return None
            try:
                return v.encode("idna").decode("ascii")
            except UnicodeError:
                return None

        return s.map(enc)

    return _udf(col)


def decode_punycode(col: Column) -> Column:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _udf(s):
        def dec(v):
            if v is None:
                return None
            try:
                return v.encode("ascii").decode("idna")
            except (UnicodeError, UnicodeDecodeError):
                return None

        return s.map(dec)

    return _udf(col)


def ip_cidr_contains(cidr: str, col: Column) -> Column:
    """VRL ip_cidr_contains('10.0.0.0/8', .ip) — pure bit arithmetic."""
    base, bits = cidr.split("/")
    bits = int(bits)
    mask = (0xFFFFFFFF << (32 - bits)) & 0xFFFFFFFF if bits else 0
    base_long = 0
    for part in base.split("."):
        base_long = base_long * 256 + int(part)
    return ip_to_long(col).bitwiseAND(F.lit(mask)) == F.lit(base_long & mask)


def ip_subnet(col: Column, bits: int) -> Column:
    """Network address of the /bits subnet, dotted-quad."""
    mask = (0xFFFFFFFF << (32 - bits)) & 0xFFFFFFFF
    net = ip_to_long(col).bitwiseAND(F.lit(mask))
    return F.concat_ws(
        ".",
        (net / 16777216).cast("long").cast("string"),
        F.pmod((net / 65536).cast("long"), F.lit(256)).cast("string"),
        F.pmod((net / 256).cast("long"), F.lit(256)).cast("string"),
        F.pmod(net, F.lit(256)).cast("string"),
    )


def encode_logfmt(col: Column) -> Column:
    """VRL encode_logfmt: map<string,string> → 'k=v k2=v2' with keys
    sorted (the reference emits sorted fields for determinism); values
    containing spaces/quotes are double-quoted."""
    entries = F.array_sort(F.map_entries(col))
    render = F.transform(
        entries,
        lambda e: F.concat(
            e.getField("key"),
            F.lit("="),
            F.when(
                e.getField("value").rlike(r'[\s"=]'),
                F.concat(
                    F.lit('"'),
                    F.regexp_replace(e.getField("value"), r'"', r'\\"'),
                    F.lit('"'),
                ),
            ).otherwise(e.getField("value")),
        ),
    )
    return F.array_join(render, " ")


#: VRL encode_key_value with default separators == logfmt
encode_key_value = encode_logfmt


def encode_csv(col: Column, fields: list[str]) -> Column:
    """VRL encode_csv: struct fields → one CSV line (RFC-4180 quoting
    for separators/quotes)."""
    cells = [
        F.when(
            col.getField(f).cast("string").rlike(r'[",\n]'),
            F.concat(
                F.lit('"'),
                F.regexp_replace(col.getField(f).cast("string"), '"', '""'),
                F.lit('"'),
            ),
        ).otherwise(F.coalesce(col.getField(f).cast("string"), F.lit("")))
        for f in fields
    ]
    return F.concat_ws(",", *cells)


def encode_base16(col: Column) -> Column:
    return F.hex(col.cast("binary"))


def decode_base16(col: Column) -> Column:
    return F.unhex(col).cast("string")


def encode_percent(col: Column) -> Column:
    """VRL encode_percent — url_encode is a Spark builtin."""
    return F.url_encode(col)


def decode_percent(col: Column) -> Column:
    return F.url_decode(col)


def parse_query_string(col: Column) -> Column:
    """VRL parse_query_string: 'a=1&b=two' → map (later duplicate key
    wins, like the reference's BTreeMap insert)."""
    pairs = F.split(F.regexp_replace(col, r"^\?", ""), "&")
    kvs = F.filter(pairs, lambda p: p != "")
    entries = F.transform(
        kvs,
        lambda p: F.struct(
            F.url_decode(F.regexp_extract(p, "^([^=]*)", 1)).alias("key"),
            F.url_decode(
                F.regexp_extract(p, "^[^=]*=?(.*)$", 1)
            ).alias("value"),
        ),
    )
    # last duplicate wins: drop any entry with a later same-key entry
    # (map_from_entries raises on duplicates under the default policy)
    deduped = F.filter(
        entries,
        lambda e, i: ~F.exists(
            F.slice(
                entries, i + 2, F.greatest(F.size(entries) - i - 1, F.lit(0))
            ),
            lambda x: x.getField("key") == e.getField("key"),
        ),
    )
    return F.map_from_entries(deduped)


def parse_int(col: Column, base: int = 10) -> Column:
    """VRL parse_int with radix (fallible)."""
    if base == 10:
        return col.try_cast("long")
    return F.conv(col, base, 10).try_cast("long")


# --------------------------------------------------------------------------
# Number


def round_num(col: Column, precision: int = 0) -> Column:
    return F.round(col, precision)


floor_num = F.floor
ceil_num = F.ceil
abs_num = F.abs
mod = F.pmod


# --------------------------------------------------------------------------
# Type checks


def is_empty(col: Column, kind: str = "string") -> Column:
    """VRL is_empty over string/array/map (is_empty("") ==
    is_empty([]) == is_empty({}) == true).  A Spark Column carries no
    type before analysis, so pass kind='array'|'map' for containers —
    they use F.size; the default string branch uses F.length (casting
    an array to string would render '[]' with length 2)."""
    if kind in ("array", "map"):
        return F.coalesce(F.size(col) == 0, F.lit(True))
    return F.coalesce(F.length(col.cast("string")) == 0, F.lit(True))


def is_nullish(col: Column) -> Column:
    """VRL is_nullish: null, empty, whitespace-only, or '-'."""
    s = F.trim(col.cast("string"))
    return col.isNull() | (s == "") | (s == "-")


_SYSLOG_SEVERITIES = [
    "emerg", "alert", "crit", "err", "warning", "notice", "info", "debug",
]
_SYSLOG_FACILITIES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
    "solaris-cron", "local0", "local1", "local2", "local3", "local4",
    "local5", "local6", "local7",
]


def to_syslog_severity(col: Column) -> Column:
    """VRL to_syslog_severity: keyword → numeric severity (fallible)."""
    out = F.lit(None).cast("int")
    for i, name in enumerate(_SYSLOG_SEVERITIES):
        out = F.when(F.lower(col) == name, i).otherwise(out)
    return F.when(F.lower(col) == "panic", 0).otherwise(
        F.when(F.lower(col) == "error", 3).otherwise(
            F.when(F.lower(col) == "warn", 4).otherwise(out)
        )
    )


def to_syslog_level(col: Column) -> Column:
    """VRL to_syslog_level: numeric severity → keyword (fallible)."""
    out = F.lit(None).cast("string")
    for i, name in enumerate(_SYSLOG_SEVERITIES):
        out = F.when(col.cast("int") == i, name).otherwise(out)
    return out


def to_syslog_facility(col: Column) -> Column:
    """VRL to_syslog_facility: facility code → keyword (fallible)."""
    out = F.lit(None).cast("string")
    for i, name in enumerate(_SYSLOG_FACILITIES):
        out = F.when(col.cast("int") == i, name).otherwise(out)
    return out


# Number extras (VRL exp/ln/sqrt/pow are thin)
exp = F.exp
ln = F.log
sqrt = F.sqrt
pow_num = F.pow


# --------------------------------------------------------------------------
# Type checks — VRL's runtime is_* over dynamic Values; on a typed
# engine the answer is static per column, so these resolve from the
# schema at the driver (the Kind-inference analogue, SURVEY §1.5)


def _dtype(df, col_name: str) -> str:
    return dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)[
        col_name
    ]


def is_string(df, col_name: str) -> bool:
    return _dtype(df, col_name) == "string"


def is_integer(df, col_name: str) -> bool:
    return _dtype(df, col_name) in ("int", "bigint", "smallint", "tinyint")


def is_float(df, col_name: str) -> bool:
    return _dtype(df, col_name) in ("double", "float")


def is_boolean(df, col_name: str) -> bool:
    return _dtype(df, col_name) == "boolean"


def is_timestamp(df, col_name: str) -> bool:
    return _dtype(df, col_name).startswith("timestamp")


def is_array(df, col_name: str) -> bool:
    return _dtype(df, col_name).startswith("array")


def is_object(df, col_name: str) -> bool:
    t = _dtype(df, col_name)
    return t.startswith("struct") or t.startswith("map")


# --------------------------------------------------------------------------
# Object / Map

object_keys = F.map_keys
object_values = F.map_values


def object_from_entries(keys: Column, values: Column) -> Column:
    return F.map_from_arrays(keys, values)


# --------------------------------------------------------------------------
# Array extras


def chunk(col: Column, size: int) -> Column:
    """VRL chunk: split an array into fixed-size slices."""
    n_chunks = F.ceil(F.size(col) / F.lit(size)).cast("int")
    idx = F.when(F.size(col) > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.slice(col, i * size + 1, size))


zip_arrays = F.arrays_zip
flatten_array = F.flatten


def unzip_arrays(col: Column) -> Column:
    """VRL unzip: array of 2-element arrays → array of the two
    projected arrays [[a1,a2,...],[b1,b2,...]]."""
    firsts = F.transform(col, lambda p: F.get(p, 0))
    seconds = F.transform(col, lambda p: F.get(p, 1))
    return F.array(firsts, seconds)


# --------------------------------------------------------------------------
# String extras

repeat = F.repeat
pad_left = F.lpad
pad_right = F.rpad
reverse_string = F.reverse


def find(col: Column, sub: str) -> Column:
    """VRL find: index of substring, -1 when absent (0-based like VRL)."""
    return F.instr(col, sub) - 1


def format_number(col: Column, decimals: int = 2) -> Column:
    return F.format_number(col, decimals)


def from_unix_timestamp(col: Column, unit: str = "seconds") -> Column:
    if unit == "seconds":
        return F.timestamp_seconds(col)
    if unit == "milliseconds":
        return F.timestamp_millis(col)
    if unit == "microseconds":
        return F.timestamp_micros(col)
    raise ValueError(f"unknown unit {unit!r}")


# --------------------------------------------------------------------------
# String case conversions (VRL camelcase/snakecase/kebabcase/pascalcase)


def _words(col: Column) -> Column:
    # split camelCase / snake_case / kebab-case / spaces into words
    spaced = F.regexp_replace(col, r"([a-z0-9])([A-Z])", r"$1 $2")
    return F.filter(
        F.split(F.lower(spaced), r"[\s_\-]+"), lambda w: w != ""
    )


def snakecase(col: Column) -> Column:
    return F.array_join(_words(col), "_")


def kebabcase(col: Column) -> Column:
    return F.array_join(_words(col), "-")


def camelcase(col: Column) -> Column:
    ws = _words(col)
    return F.concat(
        F.coalesce(F.get(ws, 0), F.lit("")),
        F.array_join(
            F.transform(
                F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0))),
                F.initcap,
            ),
            "",
        ),
    )


def pascalcase(col: Column) -> Column:
    return F.array_join(F.transform(_words(col), F.initcap), "")


def screamingsnakecase(col: Column) -> Column:
    """VRL screamingsnakecase: 'InputText' → 'INPUT_TEXT'."""
    return F.upper(snakecase(col))


# --------------------------------------------------------------------------
# System (driver-resolved constants, like aws_ec2_metadata enrichment)


def get_env_var(name: str, default: str = "") -> Column:
    return F.lit(os.environ.get(name, default))


def get_hostname() -> Column:
    return F.lit(socket.gethostname())


# --------------------------------------------------------------------------
# Round-4 late VRL-surface completion


def strlen(col: Column) -> Column:
    """VRL strlen — UTF-8 CHARACTER count (length() counts chars in
    Spark already; byte length is octet_length)."""
    return F.char_length(col)


def parse_float(col: Column) -> Column:
    """VRL parse_float! — fallible string → double (NULL on failure,
    the try_cast convention for fallible VRL coercions)."""
    return col.cast("string").try_cast("double")


def format_int(col: Column, base: int = 10) -> Column:
    """VRL format_int — integer → string in the given radix.  conv()
    treats its input as unsigned 64-bit, so negative values get an
    explicit sign (VRL renders -255 base 16 as '-ff', not the two's
    complement 'ffffffffffffff01')."""
    if base == 10:
        return col.cast("long").cast("string")
    lng = col.cast("long")
    # magnitude via decimal(20,0) so abs(i64::MIN) doesn't overflow
    mag = F.lower(
        F.conv(F.abs(lng.cast("decimal(20,0)")).cast("string"), 10, base)
    )
    return F.when(lng < 0, F.concat(F.lit("-"), mag)).otherwise(mag)


def is_json(col: Column) -> Column:
    """VRL is_json — does the string parse as JSON?  JVM-side via
    try_parse_json (variant); NULL input → false like VRL."""
    return F.coalesce(
        F.try_parse_json(col).isNotNull(), F.lit(False)
    )


def map_keys(col: Column, fn) -> Column:
    """VRL map_keys — transform every key of a map column."""
    return F.transform_keys(col, lambda k, _v: fn(k))


def map_values(col: Column, fn) -> Column:
    """VRL map_values — transform every value of a map column."""
    return F.transform_values(col, lambda _k, v: fn(v))


def object_from_array(col: Column) -> Column:
    """VRL object_from_array — array of [key, value] pairs → map."""
    return F.map_from_entries(
        F.transform(col, lambda p: F.struct(
            F.get(p, 0).alias("key"), F.get(p, 1).alias("value")
        ))
    )


def contains_all(col: Column, items: list) -> Column:
    """VRL contains_all — array contains every item."""
    return F.size(
        F.array_except(F.array(*[F.lit(x) for x in items]), col)
    ) == 0


def get_timezone_name() -> Column:
    """VRL get_timezone_name — the session timezone."""
    return F.expr("current_timezone()")


def match_datadog_query(query: str, **kwargs) -> Column:
    """VRL match_datadog_query — compile a Datadog search query into a
    boolean Column over the event's columns (the full DSL compiler in
    conditions_datadog.py: facets, wildcards, ranges, tag arrays;
    kwargs pass through to ``datadog_search``)."""
    from vector_spark.conditions_datadog import datadog_search

    return datadog_search(query, **kwargs)


def parse_influxdb(col: Column) -> Column:
    """VRL parse_influxdb — influx line protocol → struct (the codec
    the sources layer uses, exposed as a remap function)."""
    from vector_spark.sources.readers import _decode_influx

    return _decode_influx(col, None)


def flatten_object(col: Column, separator: str = ".") -> Column:
    """VRL flatten over an object: nested JSON string → single-level
    JSON with dotted keys (arrays indexed).  Arrow-batched — the same
    codec-seam convention as the gzip/cbor kernels."""
    import json as _json

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def flat(prefix: str, v, out: dict) -> None:
        if isinstance(v, dict) and v:
            for k, x in v.items():
                flat(f"{prefix}{separator}{k}" if prefix else str(k), x, out)
        elif isinstance(v, list) and v:
            for idx, x in enumerate(v):
                flat(f"{prefix}{separator}{idx}" if prefix else str(idx),
                     x, out)
        else:
            out[prefix] = v

    @pandas_udf("string")
    def _udf(s: pd.Series) -> pd.Series:
        def run(txt):
            if txt is None:
                return None
            try:
                v = _json.loads(txt)
            except ValueError:
                return None
            out: dict = {}
            flat("", v, out)
            return _json.dumps(out, separators=(",", ":"), sort_keys=True)

        return s.map(run)

    return _udf(col)


def decode_mime_q(col: Column) -> Column:
    """VRL decode_mime_q — RFC 2047 encoded-words ('=?utf-8?Q?...?=')
    → decoded text (mail/syslog headers)."""
    from email.header import decode_header

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _udf(s):
        def run(txt):
            if txt is None:
                return None
            try:
                parts = decode_header(txt)
            except Exception:
                return txt
            out = []
            for raw, enc in parts:
                if isinstance(raw, bytes):
                    out.append(raw.decode(enc or "ascii", errors="replace"))
                else:
                    out.append(raw)
            return "".join(out)

        return s.map(run)

    return _udf(col)


def ip_pton(col: Column) -> Column:
    """VRL ip_pton — IPv4/IPv6 text → packed bytes (4 or 16)."""
    import socket

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _udf(s):
        def run(txt):
            if txt is None:
                return None
            for fam in (socket.AF_INET, socket.AF_INET6):
                try:
                    return socket.inet_pton(fam, txt)
                except OSError:
                    continue
            return None

        return s.map(run)

    return _udf(col)


def ip_ntop(col: Column) -> Column:
    """VRL ip_ntop — packed 4/16 bytes → IPv4/IPv6 text."""
    import socket

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _udf(s):
        def run(b):
            if b is None:
                return None
            raw = bytes(b)
            try:
                if len(raw) == 4:
                    return socket.inet_ntop(socket.AF_INET, raw)
                if len(raw) == 16:
                    return socket.inet_ntop(socket.AF_INET6, raw)
            except OSError:
                pass
            return None

        return s.map(run)

    return _udf(col)


def encode_zstd(col: Column) -> Column:
    """VRL encode_zstd — import-try gated (zstandard not bundled in
    this container; identical call works where it is)."""
    try:
        import zstandard
    except ImportError as exc:
        raise RuntimeError(
            "encode_zstd requires the 'zstandard' package (not bundled "
            f"in this environment): {exc}"
        ) from exc
    c = zstandard.ZstdCompressor(level=3)
    return _binary_pandas_udf(c.compress, "encode_zstd")(
        col.cast("binary")
    )


def decode_zstd(col: Column) -> Column:
    try:
        import zstandard
    except ImportError as exc:
        raise RuntimeError(
            "decode_zstd requires the 'zstandard' package (not bundled "
            f"in this environment): {exc}"
        ) from exc
    d = zstandard.ZstdDecompressor()
    return _binary_pandas_udf(d.decompress, "decode_zstd")(col)


def encode_snappy(col: Column) -> Column:
    try:
        import snappy
    except ImportError as exc:
        raise RuntimeError(
            "encode_snappy requires the 'python-snappy' package (not "
            f"bundled in this environment): {exc}"
        ) from exc
    return _binary_pandas_udf(snappy.compress, "encode_snappy")(
        col.cast("binary")
    )


def decode_snappy(col: Column) -> Column:
    try:
        import snappy
    except ImportError as exc:
        raise RuntimeError(
            "decode_snappy requires the 'python-snappy' package (not "
            f"bundled in this environment): {exc}"
        ) from exc
    return _binary_pandas_udf(snappy.decompress, "decode_snappy")(col)


def parse_dnstap(col: Column, *, lowercase_hostnames: bool = False) -> Column:
    """VRL parse_dnstap (lib/vector-vrl/dnstap-parser) — re-exported
    from :mod:`vector_spark.functions.dnstap`."""
    from vector_spark.functions.dnstap import parse_dnstap as _impl

    return _impl(col, lowercase_hostnames=lowercase_hostnames)
