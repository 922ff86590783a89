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


def parse_timestamp(col: Column, fmt: str) -> Column:
    return F.to_timestamp(col, fmt)


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


# --------------------------------------------------------------------------
# Cryptography / Checksum / Random

md5 = F.md5
sha1 = F.sha1
sha2 = F.sha2
crc32 = F.crc32


def uuid_v4() -> Column:
    """Nondeterministic, like VRL uuid_v4() — excluded from oracle
    checks by nature."""
    return F.expr("uuid()")


def random_float() -> Column:
    return F.rand()


# --------------------------------------------------------------------------
# Timestamp


def format_timestamp(col: Column, fmt: str) -> Column:
    return F.date_format(col, fmt)


def now() -> Column:
    return F.current_timestamp()


# --------------------------------------------------------------------------
# Codec


def encode_json(col: Column) -> Column:
    return F.to_json(col)


def encode_base64(col: Column) -> Column:
    return F.base64(col.cast("binary"))


def decode_base64(col: Column) -> Column:
    return F.unbase64(col).cast("string")


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


# --------------------------------------------------------------------------
# System (driver-resolved constants, like aws_ec2_metadata enrichment)


def get_env_var(name: str, default: str = "") -> Column:
    return F.lit(os.environ.get(name, default))


def get_hostname() -> Column:
    return F.lit(socket.gethostname())
