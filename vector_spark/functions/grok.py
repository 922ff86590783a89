"""Grok pattern -> regex compiler (driver-side, pure Python).

The reference executes VRL ``parse_grok``/``parse_regex`` per event
(/root/reference/src/transforms/remap.rs:581-656 runs the compiled
program; grok usage e.g.
/root/reference/regression/cases/scale_sync_only_8_cpu/vector/vector.yaml:31).
We compile the grok pattern ONCE at the driver into a plain regex with
named groups, then evaluate it engine-side — either as a single JVM
``regexp_replace``+``split`` (one regex pass, whole-stage codegen) or as
an Arrow-batched pandas UDF (``Series.str.extract``).  No per-row
Python, no per-row compilation.

Only a curated pattern library is provided (the subset exercised by the
reference's own configs + common syslog/apache patterns).
"""

from __future__ import annotations

import re

# Core grok patterns, expressed as plain regexes (public knowledge:
# the de-facto grok base patterns shipped by logstash/grok projects).
GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NONNEGINT": r"\d+",
    "NUMBER": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "POSINT": r"[1-9]\d*",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IPORHOST": r"(?:(?:\d{1,3}\.){3}\d{1,3}|[\w.-]+)",
    "HOSTNAME": r"[\w.-]+",
    "USER": r"[\w.-]+",
    "USERNAME": r"[\w.-]+",
    "EMAILADDRESS": r"[\w.+-]+@[\w.-]+",
    "UUID": r"[0-9a-fA-F]{8}-(?:[0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}",
    "MONTH": r"Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec",
    "MONTHDAY": r"(?:0[1-9]|[12]\d|3[01]|[1-9])",
    "YEAR": r"\d{4}",
    "TIME": r"\d{2}:\d{2}:\d{2}",
    "HTTPDATE": r"\d{2}/(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "SYSLOGTIMESTAMP": r"(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) +\d{1,2} \d{2}:\d{2}:\d{2}",
    "LOGLEVEL": r"[Tt]race|TRACE|[Dd]ebug|DEBUG|[Ii]nfo|INFO|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL",
    "QUOTEDSTRING": r'"[^"]*"',
    "URIPATH": r"/[^\s?#]*",
    "PROG": r"[\w._/%-]+",
}

_GROK_RE = re.compile(r"%\{(\w+)(?::([\w.\[\]]+))?\}")


class GrokError(ValueError):
    pass


def grok_to_regex(pattern: str) -> tuple[str, list[str]]:
    """Compile a grok pattern into ``(regex, field_names)``.

    ``%{SYNTAX:field}`` becomes a capture group; ``%{SYNTAX}`` matches
    without capturing.  Returns the regex with numbered groups in field
    order (Spark's regexp functions address groups by index).
    """
    fields: list[str] = []

    def sub(m: re.Match) -> str:
        syntax, field = m.group(1), m.group(2)
        if syntax not in GROK_PATTERNS:
            raise GrokError(f"unknown grok pattern %{{{syntax}}}")
        body = GROK_PATTERNS[syntax]
        if field:
            fields.append(field.replace(".", "_").replace("[", "_").replace("]", ""))
            return f"({body})"
        return f"(?:{body})"

    regex = _GROK_RE.sub(sub, pattern)
    return regex, fields
