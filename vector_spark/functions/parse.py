"""Vectorized parse stage — the Spark-native `remap` + `parse_*` analogue.

Reference semantics: VRL ``parse_regex``/``parse_grok``/``parse_json``
executed per event by the remap transform
(/root/reference/src/transforms/remap.rs:581-656); parse failure routes
the original event to the ``dropped`` output port
(/root/reference/src/transforms/remap.rs:116-155, :50).

Two engines, both fully vectorized:

- ``jvm`` (default): ONE regex pass per format via
  ``regexp_replace(text, anchored, '$1\\x01$2...')`` + ``split`` —
  stays inside whole-stage codegen, zero Python.  This is the 100 TB
  path.
- ``pandas``: Arrow-batched ``Series.str.extract`` pandas UDF with the
  grok-compiled regex (named groups), compiled once per executor — the
  input_hint's vectorized-UDF showcase; useful when a pattern needs
  features Java regex lacks.

Both produce the identical ``parsed`` struct, verified against the
DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from vector_spark.functions.grok import grok_to_regex

SEP = "\x01"

# ---------------------------------------------------------------------------
# Transcript text formats (FIXTURES.md F1a; modeled on the reference's
# demo_logs formats, /root/reference/src/sources/demo_logs.rs:102-140).

APACHE_GROK = (
    '%{IP:client_ip} - %{NOTSPACE:username} \\[%{HTTPDATE:log_time}\\] '
    '"%{WORD:http_method} %{NOTSPACE:http_url} HTTP/%{NUMBER:http_proto}" '
    '%{INT:http_status} %{INT:http_bytes}'
)
APACHE_REGEX, APACHE_FIELDS = grok_to_regex(APACHE_GROK)
APACHE_ANCHORED = f"^{APACHE_REGEX}$"

LOGFMT_LEVEL = r"level=(\w+)"
LOGFMT_CODE = r"code=(E\d{3})"
LOGFMT_RETRY = r"retry=(true|false)"
LOGFMT_MSG = r'msg="([^"]*)"'

#: `format` lives OUTSIDE this struct (own column): keeping it inside
#: forced a withField over from_json, which the optimizer expands into
#: one from_json evaluation PER FIELD (~12x JSON parse cost per row)
_PARSED_FIELDS: list[tuple[str, T.DataType]] = [
    ("client_ip", T.StringType()),
    ("username", T.StringType()),
    ("log_time", T.StringType()),
    ("http_method", T.StringType()),
    ("http_url", T.StringType()),
    ("http_status", T.IntegerType()),
    ("http_bytes", T.LongType()),
    ("level", T.StringType()),
    ("msg", T.StringType()),
    ("latency_ms", T.LongType()),
    ("service", T.StringType()),
    ("code", T.StringType()),
    ("retry", T.BooleanType()),
]
PARSED_SCHEMA = T.StructType([T.StructField(n, t, True) for n, t in _PARSED_FIELDS])


# ---------------------------------------------------------------------------
# Generic building blocks


def regex_extract_struct(col: Column, regex: str, fields: list[str]) -> Column:
    """All capture groups of ``regex`` in ONE JVM regex pass.

    ``regexp_replace`` rewrites the (anchored) match into a
    SEP-delimited string of its groups; ``split`` then fans it out.
    Rows that don't match yield a null struct.  Equivalent of VRL
    ``parse_regex`` (named captures) without per-group re-evaluation.
    """
    repl = SEP.join(f"${i + 1}" for i in range(len(fields)))
    packed = F.split(F.regexp_replace(col, regex, repl), SEP)
    struct = F.struct(
        *[F.nullif(packed.getItem(i), F.lit("")).alias(f) for i, f in enumerate(fields)]
    )
    return F.when(col.rlike(regex), struct)


def parse_key_value(
    col: Column, field_delim: str = " ", kv_delim: str = "="
) -> Column:
    """VRL ``parse_key_value`` (logfmt) → MapType via str_to_map."""
    return F.str_to_map(col, F.lit(field_delim), F.lit(kv_delim))


# ---------------------------------------------------------------------------
# Transcript parser — jvm engine

_CSV_SCHEMA = ", ".join(f"{n} {t.simpleString()}" for n, t in _PARSED_FIELDS)
_CSV_OPTS = {"sep": SEP, "quote": "", "nullValue": ""}

# apache capture groups mapped into PARSED_SCHEMA slot order
# (client_ip, username, log_time, http_method, http_url skip proto,
#  http_status, http_bytes)
_APACHE_REPL = SEP.join(
    f"${APACHE_FIELDS.index(f) + 1}"
    for f in ["client_ip", "username", "log_time", "http_method",
              "http_url", "http_status", "http_bytes"]
)


def detect_format(text: Column) -> Column:
    """Cheap format discriminator — the `format` column."""
    return (
        F.when(text.rlike(APACHE_ANCHORED), "apache")
        .when(text.startswith('{"'), "json")
        .when(text.startswith("level="), "logfmt")
    )


def parsed_column_jvm(text: Column) -> Column:
    """The `parsed` struct computed entirely with built-in functions.

    Performance: each branch evaluates its expensive primitive exactly
    ONCE per row — `regexp_replace` packs all apache capture groups
    into a SEP-delimited line that `from_csv` turns into the full typed
    struct, and JSON rows go through a single `from_json`.  (Building
    the struct field-by-field instead re-inlines the regex per field:
    Catalyst's subexpression elimination does not reach into
    conditional branches, which costs ~9 regex evaluations per row.)
    """
    is_apache = text.rlike(APACHE_ANCHORED)
    is_json = text.startswith('{"')
    is_logfmt = text.startswith("level=")

    apache_packed = F.concat(
        F.regexp_replace(text, APACHE_ANCHORED, _APACHE_REPL),
        F.lit(SEP * 6),  # level..retry slots are null
    )
    apache = F.from_csv(apache_packed, _CSV_SCHEMA, _CSV_OPTS)

    # PARSED_SCHEMA carries no `format`, so from_json is used verbatim
    # (one evaluation; a withField here re-expands per extracted field)
    json_struct = F.from_json(text, PARSED_SCHEMA)

    null_s = F.lit(None).cast("string")
    logfmt = F.struct(
        null_s.alias("client_ip"),
        null_s.alias("username"),
        null_s.alias("log_time"),
        null_s.alias("http_method"),
        null_s.alias("http_url"),
        F.lit(None).cast("int").alias("http_status"),
        F.lit(None).cast("long").alias("http_bytes"),
        F.nullif(F.regexp_extract(text, LOGFMT_LEVEL, 1), F.lit("")).alias("level"),
        F.nullif(F.regexp_extract(text, LOGFMT_MSG, 1), F.lit("")).alias("msg"),
        F.lit(None).cast("long").alias("latency_ms"),
        null_s.alias("service"),
        F.nullif(F.regexp_extract(text, LOGFMT_CODE, 1), F.lit("")).alias("code"),
        (F.regexp_extract(text, LOGFMT_RETRY, 1) == "true").alias("retry"),
    )

    return (
        F.when(is_apache, apache)
        .when(is_json, json_struct)
        .when(is_logfmt, logfmt)
    )


# ---------------------------------------------------------------------------
# Transcript parser — pandas engine (Arrow-batched, grok showcase)


def _make_pandas_parser():
    import re as _re

    apache_named = grok_named_regex(APACHE_GROK)

    @F.pandas_udf(PARSED_SCHEMA)
    def parse_batch(text: pd.Series) -> pd.DataFrame:
        # compiled once per python worker, reused across Arrow batches
        ap_re = _re.compile(f"^{apache_named}$")
        out = pd.DataFrame(index=text.index)
        ap = text.str.extract(ap_re)
        is_json = text.str.startswith('{"')
        is_logfmt = text.str.startswith("level=")
        is_apache = ap["client_ip"].notna()

        js = pd.DataFrame(index=text.index, columns=["level", "msg", "latency_ms", "service"])
        if is_json.any():
            import json as _json

            def jload(s):
                try:
                    return _json.loads(s)
                except Exception:
                    return {}

            parsed = text[is_json].map(jload)
            js.loc[is_json, "level"] = parsed.map(lambda d: d.get("level"))
            js.loc[is_json, "msg"] = parsed.map(lambda d: d.get("msg"))
            js.loc[is_json, "latency_ms"] = parsed.map(lambda d: d.get("latency_ms"))
            js.loc[is_json, "service"] = parsed.map(lambda d: d.get("service"))

        lf_level = text.str.extract(LOGFMT_LEVEL, expand=False)
        lf_code = text.str.extract(LOGFMT_CODE, expand=False)
        lf_retry = text.str.extract(LOGFMT_RETRY, expand=False)
        lf_msg = text.str.extract(LOGFMT_MSG, expand=False)

        for c in ["client_ip", "username", "log_time", "http_method", "http_url"]:
            out[c] = ap[c]
        out["http_status"] = pd.to_numeric(ap["http_status"], errors="coerce").astype("Int32")
        out["http_bytes"] = pd.to_numeric(ap["http_bytes"], errors="coerce").astype("Int64")
        out["level"] = js["level"].where(is_json, lf_level.where(is_logfmt))
        out["msg"] = js["msg"].where(is_json, lf_msg.where(is_logfmt))
        out["latency_ms"] = pd.to_numeric(js["latency_ms"], errors="coerce").astype("Int64")
        out["service"] = js["service"].where(is_json)
        out["code"] = lf_code.where(is_logfmt)
        out["retry"] = (
            (lf_retry == "true").where(is_logfmt & lf_retry.notna()).astype("boolean")
        )
        # column order must match PARSED_SCHEMA
        return out[[n for n, _ in _PARSED_FIELDS]]

    return parse_batch


def grok_named_regex(pattern: str) -> str:
    """Grok → regex with NAMED groups (for pandas ``str.extract``)."""
    regex, fields = grok_to_regex(pattern)
    # re-insert names positionally
    out, i = [], 0
    depth_seen = 0
    j = 0
    while j < len(regex):
        ch = regex[j]
        if ch == "\\":
            out.append(regex[j : j + 2])
            j += 2
            continue
        if ch == "(" and not regex.startswith("(?", j):
            out.append(f"(?P<{fields[depth_seen]}>")
            depth_seen += 1
            j += 1
            continue
        out.append(ch)
        j += 1
    return "".join(out)


# ---------------------------------------------------------------------------
# Public operator


def parse_transcripts(df: DataFrame, engine: str = "jvm") -> DataFrame:
    """Add ``parsed`` struct + ``parse_ok`` flag to a transcripts frame.

    Rows whose text matches none of the formats get a null ``parsed``
    and ``parse_ok = false`` — the remap error channel; split with
    :func:`split_errors`.
    """
    text = F.col("text")
    # parse_ok is derived from cheap format detection, NOT from
    # parsed.isNotNull() — referencing `parsed` would re-inline the
    # whole parse expression a second time per row
    ok = (
        text.rlike(APACHE_ANCHORED)
        | text.startswith('{"')
        | text.startswith("level=")
    )
    if engine == "jvm":
        parsed = parsed_column_jvm(text)
    elif engine == "pandas":
        parsed = _make_pandas_parser()(text)
        parsed = F.when(ok, parsed)
    else:
        raise ValueError(f"unknown parse engine {engine!r}")
    return df.withColumns(
        {"format": detect_format(text), "parsed": parsed, "parse_ok": ok}
    )


def split_errors(
    df: DataFrame, component: str = "parse"
) -> tuple[DataFrame, DataFrame]:
    """Remap's main/dropped output ports
    (/root/reference/src/transforms/remap.rs:50,614-655): failed rows
    keep their original payload, annotated with drop metadata."""
    ok = df.filter(F.col("parse_ok"))
    dropped = (
        df.filter(~F.col("parse_ok"))
        .drop("format", "parsed", "parse_ok")
        .withColumn("_dropped_reason", F.lit("parse_error"))
        .withColumn("_dropped_component", F.lit(component))
    )
    return ok, dropped
