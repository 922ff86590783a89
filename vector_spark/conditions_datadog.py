"""Datadog Search Syntax condition → Spark Column compiler.

Reference: the `datadog_search` condition type
(/root/reference/src/conditions/datadog_search.rs; syntax per the
public Datadog log search docs).  The reference delegates parsing to
the vrl crate's `datadog_search_syntax`; this is an independent
recursive-descent implementation of the commonly used subset over FLAT
event schemas:

- ``*`` match-all, ``_exists_:field``, ``_missing_:field``
- ``field:value`` facet equality (numbers/booleans coerced; ``*``
  wildcards compile to anchored regex, datadog_filter::wildcard_regex)
- ``field:"quoted phrase"`` exact string
- bare ``keyword`` / ``"quoted phrase"`` → word-boundary match on the
  default field (message), like datadog_filter::word_regex
- ``-term`` / ``NOT term`` negation, ``AND`` / ``OR`` / implicit AND,
  parentheses
- ``field:>n  >=n  <n  <=n`` numeric comparisons
- ``field:[a TO b]`` inclusive range
- backslash escapes in values (``va\\ lue``, ``va\\*lue``)

``@attr`` maps to column ``attr`` (strip the marker); pass
``resolver`` to customize.

Tags-array matching (datadog_search.rs:102-160 EventFilter): pass
``tags_cols=("ddtags",)`` (the array<string> columns holding
``key:value`` tag elements) to enable Datadog's reserved event shape:
non-``@``, non-reserved facet names become TAG facets matched against
the array elements (``env:prod`` matches an element ``"env:prod"``;
wildcards match per element; ``_exists_:env`` matches an element
``"env"`` or any ``"env:..."``), the literal ``tags:value`` facet
matches a whole element, and ``source:`` matches either the ``source``
or ``ddsource`` column.  Default (``tags_cols=None``) keeps the flat
schema semantics.

Null semantics: every leaf is null-safe (a missing/null field never
matches), so ``NOT`` behaves like Datadog's, not like SQL ternary
logic.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lparen>\() |
        (?P<rparen>\)) |
        (?P<quoted>"(?:\\.|[^"\\])*") |
        (?P<term>(?:\\.|[^\s()"])+(?:"(?:\\.|[^"\\])*")?)
    )""",
    re.VERBOSE,
)


def _tokenize(q: str) -> list[str]:
    out, i = [], 0
    while i < len(q):
        m = _TOKEN.match(q, i)
        if not m:
            raise ValueError(f"bad datadog-search syntax at {q[i:]!r}")
        if m.lastgroup == "lparen":
            out.append("(")
        elif m.lastgroup == "rparen":
            out.append(")")
        else:
            out.append(m.group(m.lastgroup))
        i = m.end()
    return out


def _unescape(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s)


class _Parser:
    def __init__(self, tokens: list[str], leaf):
        self.toks = tokens
        self.pos = 0
        self.leaf = leaf

    def peek(self) -> str | None:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self) -> str:
        if self.pos >= len(self.toks):
            raise ValueError("unexpected end of query")
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def parse(self) -> Column:
        c = self.or_expr()
        if self.peek() is not None:
            raise ValueError(f"trailing input at {self.toks[self.pos:]}")
        return c

    def or_expr(self) -> Column:
        c = self.and_expr()
        while self.peek() == "OR":
            self.next()
            c = c | self.and_expr()
        return c

    def and_expr(self) -> Column:
        c = self.unary()
        while (t := self.peek()) is not None and t not in (")", "OR"):
            if t == "AND":
                self.next()
                continue
            c = c & self.unary()
        return c

    def unary(self) -> Column:
        t = self.peek()
        if t in ("NOT", "-"):
            self.next()
            return ~self.unary()
        if t is not None and t.startswith("-") and len(t) > 1:
            self.toks[self.pos] = t[1:]
            return ~self.unary()
        return self.primary()

    def primary(self) -> Column:
        t = self.next()
        if t == "(":
            c = self.or_expr()
            if self.next() != ")":
                raise ValueError("unbalanced parentheses")
            return c
        # range values contain a space ("[a TO b]") and were split by the
        # tokenizer — re-join  field:[a  TO  b]
        if t.endswith(":[") or ":[" in t and not t.endswith("]"):
            while not t.endswith("]") and self.peek() is not None:
                t += " " + self.next()
        return self.leaf(t)


def _wildcard_to_regex(value: str) -> str:
    parts = [re.escape(p) for p in value.split("*")]
    return "^" + ".*".join(parts) + "$"


def _word_regex(value: str) -> str:
    parts = [re.escape(p) for p in value.split("*")]
    return r"\b" + ".*".join(parts) + r"\b"


def _null_safe(c: Column) -> Column:
    return F.coalesce(c, F.lit(False))


#: Datadog reserved (non-tag) top-level fields
#: (datadog_search_syntax Resolver defaults)
RESERVED_FIELDS = frozenset(
    {"host", "message", "source", "service", "status", "tags",
     "timestamp", "trace_id"}
)


def datadog_search(
    query: str,
    *,
    default_field: str = "message",
    resolver=None,
    tags_cols: tuple[str, ...] | None = None,
    columns: set[str] | frozenset[str] | None = None,
) -> Column:
    """Compile a Datadog search query string to a boolean Column.

    ``columns``: pass the frame's column set (``set(df.columns)``) to
    make facets on ABSENT columns compile to no-match (Datadog's
    missing-attribute semantics) instead of failing analysis — e.g.
    the reserved ``source:`` facet consults both source and ddsource,
    and most frames carry only one of the two."""
    if resolver is not None and columns is not None:
        raise ValueError(
            "pass either resolver= or columns=, not both — a custom "
            "resolver owns name→Column mapping entirely (wrap your own "
            "absent-column handling inside it)"
        )
    if resolver is not None:
        resolve = resolver
    elif columns is not None:
        resolve = lambda name: (  # noqa: E731
            F.col(name.lstrip("@"))
            if name.lstrip("@") in columns
            else F.lit(None).cast("string")
        )
    else:
        resolve = lambda name: F.col(name.lstrip("@"))  # noqa: E731

    def any_tag(pred) -> Column:
        cond = F.lit(False)
        for tc in tags_cols:
            cond = cond | F.coalesce(F.exists(F.col(tc), pred), F.lit(False))
        return cond

    def is_tag_facet(field: str) -> bool:
        return (
            tags_cols is not None
            and not field.startswith("@")
            and field not in RESERVED_FIELDS
        )

    def tag_facet_match(tag: str, raw: str) -> Column:
        """Element-wise ``tag:value`` match over the tags arrays
        (datadog_search.rs equals/compare for Field::Tag)."""
        if raw.startswith('"') and raw.endswith('"') and len(raw) >= 2:
            want = f"{tag}:{_unescape(raw[1:-1])}"
            return any_tag(lambda v: v == want)
        m = re.match(r"^(>=|<=|>|<)(.+)$", raw)
        if m:
            op, operand = m.group(1), m.group(2)
            prefix = tag + ":"

            def cmp(v: Column) -> Column:
                suffix = F.substring(v, len(prefix) + 1, 2_147_483_647)
                try:
                    rhs: object = float(operand)
                    c = suffix.cast("double")
                except ValueError:
                    rhs = _unescape(operand)
                    c = suffix
                cond = {
                    "<": c < rhs, "<=": c <= rhs,
                    ">": c > rhs, ">=": c >= rhs,
                }[op]
                return v.startswith(prefix) & F.coalesce(cond, F.lit(False))

            return any_tag(cmp)
        if "*" in raw.replace("\\*", ""):
            pattern = "^" + re.escape(tag) + ":" + ".*".join(
                re.escape(_unescape(p)) for p in re.split(r"(?<!\\)\*", raw)
            ) + "$"
            return any_tag(lambda v: v.rlike(pattern))
        want = f"{tag}:{_unescape(raw)}"
        return any_tag(lambda v: v == want)

    def tag_exists(tag: str) -> Column:
        """``_exists_:tag`` — element == tag or startswith "tag:"
        (datadog_search.rs exists for Field::Tag)."""
        prefix = tag + ":"
        return any_tag(lambda v: (v == tag) | v.startswith(prefix))

    def facet_match(field: str, raw: str) -> Column:
        if tags_cols is not None and field == "tags":
            # literal tags facet: match a WHOLE element; unquoted
            # values take wildcards like every other facet
            if raw.startswith('"') and raw.endswith('"') and len(raw) >= 2:
                value = _unescape(raw[1:-1])
                return any_tag(lambda v: v == value)
            if "*" in raw.replace("\\*", ""):
                pattern = "^" + ".*".join(
                    re.escape(_unescape(p))
                    for p in re.split(r"(?<!\\)\*", raw)
                ) + "$"
                return any_tag(lambda v: v.rlike(pattern))
            value = _unescape(raw)
            return any_tag(lambda v: v == value)
        if is_tag_facet(field):
            return tag_facet_match(field, raw)
        if tags_cols is not None and field == "source":
            # reserved source matches source OR ddsource — through the
            # resolver, so custom resolvers apply and (with `columns`)
            # a frame carrying only one of the two still compiles
            a = _facet_on_col(resolve("source"), raw)
            b = _facet_on_col(resolve("ddsource"), raw)
            return a | b
        return _facet_on_col(resolve(field), raw)

    def _facet_on_col(col: Column, raw: str) -> Column:
        if raw.startswith('"') and raw.endswith('"') and len(raw) >= 2:
            return _null_safe(
                col.cast("string") == _unescape(raw[1:-1])
            )
        m = re.match(r"^(>=|<=|>|<)(.+)$", raw)
        if m:
            op, operand = m.group(1), m.group(2)
            try:
                num: object = float(operand)
                c = col.cast("double")
            except ValueError:
                # non-numeric bound (Datadog accepts dates here):
                # lexicographic string comparison, like the range branch
                num = _unescape(operand)
                c = col.cast("string")
            return _null_safe(
                {"<": c < num, "<=": c <= num, ">": c > num, ">=": c >= num}[op]
            )
        m = re.match(r"^\[(.+?) TO (.+?)\]$", raw)
        if m:
            lo, hi = m.group(1), m.group(2)
            try:
                return _null_safe(
                    col.cast("double").between(float(lo), float(hi))
                )
            except ValueError:
                return _null_safe(
                    col.cast("string").between(_unescape(lo), _unescape(hi))
                )
        value = _unescape(raw)
        if "*" in raw.replace("\\*", ""):
            # unescaped wildcard → anchored regex; escaped \* is literal
            pattern = "^" + ".*".join(
                re.escape(_unescape(p)) for p in re.split(r"(?<!\\)\*", raw)
            ) + "$"
            return _null_safe(col.cast("string").rlike(pattern))
        if value in ("true", "false"):
            return _null_safe(
                (col.cast("string") == value)
                | (col.cast("boolean") == (value == "true"))
            )
        return _null_safe(col.cast("string") == value)

    def leaf(tok: str) -> Column:
        if tok == "*":
            return F.lit(True)
        if tok.startswith('"'):
            return _null_safe(
                resolve(default_field)
                .cast("string")
                .rlike(_word_regex(_unescape(tok[1:-1])))
            )
        m = re.match(r'^([\w@.\-]+):(.*)$', tok)
        if m and m.group(2):
            field, raw = m.group(1), m.group(2)
            if field == "_exists_":
                if is_tag_facet(raw):
                    return tag_exists(raw)
                return resolve(raw).isNotNull()
            if field == "_missing_":
                if is_tag_facet(raw):
                    return ~tag_exists(raw)
                return resolve(raw).isNull()
            return facet_match(field, raw)
        # bare keyword → word-boundary match on the default field —
        # through the resolver, so columns= / custom resolvers govern
        # free-text terms the same way they govern facets
        return _null_safe(
            resolve(default_field)
            .cast("string")
            .rlike(_word_regex(_unescape(tok)))
        )

    tokens = _tokenize(query.strip())
    if not tokens:
        return F.lit(True)
    return _Parser(tokens, leaf).parse()
