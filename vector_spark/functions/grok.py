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

The pattern library covers the de-facto logstash/grok base set (~100
patterns: COMBINEDAPACHELOG, COMMONAPACHELOG, SYSLOGLINE, QS, URI, the
date/time family, MAC/IP/path forms...), which is what the reference
resolves for ``parse_grok`` configs.  Composite patterns reference
other patterns recursively; the compiler expands them depth-first with
a recursion bound.  Oniguruma-specific syntax in the upstream
definitions (atomic groups, possessive quantifiers, lookbehind) is
re-expressed as plain regex so every compiled pattern runs in BOTH
engines we target (Java regex in Spark, RE2 in the DuckDB oracles).
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

# The logstash base set beyond the curated core.  Bodies may reference
# other patterns with %{NAME} / %{NAME:field}; grok_to_regex expands
# recursively.  Definitions follow logstash-patterns-core (public),
# simplified where the originals use Oniguruma-only syntax.
GROK_PATTERNS.update({
    # numbers / identifiers
    "BASE16NUM": r"[+-]?(?:0x)?[0-9A-Fa-f]+",
    "BASE16FLOAT": r"[+-]?(?:0x)?[0-9A-Fa-f]+(?:\.[0-9A-Fa-f]*)?",
    "EMAILLOCALPART": r"[a-zA-Z][a-zA-Z0-9_.+\-=:]+",
    "EMAILLOCAL": r"%{EMAILLOCALPART}",
    "HTTPDUSER": r"%{EMAILADDRESS}|%{USER}",
    # MAC addresses
    "CISCOMAC": r"(?:[A-Fa-f0-9]{4}\.){2}[A-Fa-f0-9]{4}",
    "WINDOWSMAC": r"(?:[A-Fa-f0-9]{2}-){5}[A-Fa-f0-9]{2}",
    "COMMONMAC": r"(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2}",
    "MAC": r"%{CISCOMAC}|%{WINDOWSMAC}|%{COMMONMAC}",
    # networks
    "IPV6": r"(?:(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}|(?:[0-9A-Fa-f]{1,4}:)+:(?:[0-9A-Fa-f]{1,4}:?)*|::(?:[0-9A-Fa-f]{1,4}:?)*)(?:%\w+)?",
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    # paths / uris
    "UNIXPATH": r"(?:/[\w_%!$@:.,+~-]*)+",
    "WINPATH": r"(?:[A-Za-z]+:|\\)(?:\\[^\\?*]*)+",
    "PATH": r"%{UNIXPATH}|%{WINPATH}",
    "TTY": r"/dev/(?:pts|tty(?:[pq])?)(?:\w+)?(?:/[0-9]+)?",
    "URIPROTO": r"[A-Za-z][A-Za-z0-9+\-.]*",
    "URIHOST": r"%{IPORHOST}(?::%{POSINT})?",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPATHPARAM": r"%{URIPATH}(?:%{URIPARAM})?",
    "URI": r"%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST})?(?:%{URIPATHPARAM})?",
    # dates and times
    "MONTHNUM": r"0?[1-9]|1[0-2]",
    "MONTHNUM2": r"0[1-9]|1[0-2]",
    "DAY": r"Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?",
    "HOUR": r"2[0123]|[01]?[0-9]",
    "MINUTE": r"[0-5][0-9]",
    "SECOND": r"(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?",
    "DATE_US": r"%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "DATE_EU": r"%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "ISO8601_TIMEZONE": r"Z|[+-]%{HOUR}(?::?%{MINUTE})",
    "ISO8601_SECOND": r"%{SECOND}",
    "DATE": r"%{DATE_US}|%{DATE_EU}",
    "DATESTAMP": r"%{DATE}[- ]%{TIME}",
    "TZ": r"[A-Z]{3,4}|[+-]\d{4}",
    "DATESTAMP_RFC822": r"%{DAY} %{MONTH} %{MONTHDAY} %{YEAR} %{TIME} %{TZ}",
    "DATESTAMP_RFC2822": r"%{DAY}, %{MONTHDAY} %{MONTH} %{YEAR} %{TIME} %{ISO8601_TIMEZONE}",
    "DATESTAMP_OTHER": r"%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{TZ} %{YEAR}",
    "DATESTAMP_EVENTLOG": r"%{YEAR}%{MONTHNUM2}%{MONTHDAY}%{HOUR}%{MINUTE}%{SECOND}",
    "HTTPDERROR_DATE": r"%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{YEAR}",
    # syslog family
    "SYSLOGPROG": r"%{PROG:program}(?:\[%{POSINT:pid}\])?",
    "SYSLOGHOST": r"%{IPORHOST}",
    "SYSLOGFACILITY": r"<%{NONNEGINT:facility}.%{NONNEGINT:priority}>",
    "SYSLOGBASE": r"%{SYSLOGTIMESTAMP:timestamp} (?:%{SYSLOGFACILITY} )?%{SYSLOGHOST:logsource} %{SYSLOGPROG}:",
    "SYSLOGBASE2": r"(?:%{SYSLOGTIMESTAMP:timestamp}|%{TIMESTAMP_ISO8601:timestamp8601}) (?:%{SYSLOGFACILITY} )?%{SYSLOGHOST:logsource} %{SYSLOGPROG}:",
    "SYSLOGLINE": r"%{SYSLOGBASE2} %{GREEDYDATA:message}",
    # apache / httpd
    "QS": r"%{QUOTEDSTRING}",
    "COMMONAPACHELOG": (
        r'%{IPORHOST:clientip} %{HTTPDUSER:ident} %{HTTPDUSER:auth} '
        r'\[%{HTTPDATE:timestamp}\] "(?:%{WORD:verb} %{NOTSPACE:request}'
        r'(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})" '
        r'%{NUMBER:response} (?:%{NUMBER:bytes}|-)'
    ),
    "COMBINEDAPACHELOG": r"%{COMMONAPACHELOG} %{QS:referrer} %{QS:agent}",
    "HTTPD20_ERRORLOG": (
        r"\[%{HTTPDERROR_DATE:timestamp}\] \[%{LOGLEVEL:loglevel}\] "
        r"(?:\[client %{IPORHOST:clientip}\] )?%{GREEDYDATA:message}"
    ),
    # java / misc
    "JAVACLASS": r"(?:[a-zA-Z$_][a-zA-Z$_0-9]*\.)*[a-zA-Z$_][a-zA-Z$_0-9]*",
    "JAVAFILE": r"(?:[a-zA-Z$_0-9. -]+)",
    "JAVATHREAD": r"(?:[A-Z]{2}-Processor[\d]+)",
    "ISO8601_DATE": r"%{YEAR}-%{MONTHNUM2}-%{MONTHDAY}",
})

# %{SYNTAX}, %{SYNTAX:field}, %{SYNTAX:field:type} — type is parsed
# and exposed via grok_field_types (grok supports int/float coercion)
_GROK_RE = re.compile(r"%\{(\w+)(?::([\w.\[\]@-]+))?(?::(\w+))?\}")

#: recursion bound for composite expansion (logstash nests ~4 deep)
_MAX_DEPTH = 16


class GrokError(ValueError):
    pass


def _norm_field(field: str) -> str:
    return field.replace(".", "_").replace("[", "_").replace("]", "").replace("@", "").replace("-", "_")


def grok_to_regex(pattern: str) -> tuple[str, list[str]]:
    """Compile a grok pattern into ``(regex, field_names)``.

    ``%{SYNTAX:field}`` becomes a capture group; ``%{SYNTAX}`` matches
    without capturing; ``%{SYNTAX:field:type}`` records the coercion
    type (query via :func:`grok_field_types`).  Composite patterns
    (COMBINEDAPACHELOG, SYSLOGLINE, ...) expand depth-first, so nested
    named fields appear in capture-group (opening-paren) order —
    Spark's regexp functions address groups by index.  Duplicate field
    names get a positional suffix so struct extraction stays unique.
    """
    fields: list[str] = []

    def expand(pat: str, depth: int) -> str:
        if depth > _MAX_DEPTH:
            raise GrokError(
                f"grok pattern recursion deeper than {_MAX_DEPTH} "
                f"(cycle?) while expanding {pattern!r}"
            )

        def sub(m: re.Match) -> str:
            syntax, field = m.group(1), m.group(2)
            if syntax not in GROK_PATTERNS:
                raise GrokError(f"unknown grok pattern %{{{syntax}}}")
            body = GROK_PATTERNS[syntax]
            if field:
                name = _norm_field(field)
                if name in fields:
                    name = f"{name}_{len(fields)}"
                fields.append(name)
                # append BEFORE expanding the body: the outer group's
                # '(' precedes any nested groups, so field order ==
                # capture-group order
                return f"({expand(body, depth + 1)})"
            return f"(?:{expand(body, depth + 1)})"

        return _GROK_RE.sub(sub, pat)

    regex = expand(pattern, 0)
    return regex, fields


def grok_field_types(pattern: str) -> dict[str, str]:
    """field -> declared coercion type (``%{NUMBER:bytes:int}``) for
    the top-level pattern; fields without a type are absent."""
    return {
        _norm_field(m.group(2)): m.group(3)
        for m in _GROK_RE.finditer(pattern)
        if m.group(2) and m.group(3)
    }
