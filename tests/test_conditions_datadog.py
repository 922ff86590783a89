"""Datadog-search condition compiler: parity cases modeled on the
reference's (source, pass_event, fail_event) triples
(/root/reference/src/conditions/datadog_search.rs:481-900) restricted
to the flat-schema subset the module documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.conditions_datadog import datadog_search

SCHEMA = (
    "message string, host string, a string, n double, flag boolean, "
    "status string"
)
BLANK = {c: None for c in
         ("message", "host", "a", "n", "flag", "status")}


def _matches(spark, query: str, event: dict) -> bool:
    row = {**BLANK, **event}
    df = spark.createDataFrame([tuple(row[c] for c in (
        "message", "host", "a", "n", "flag", "status"))], SCHEMA)
    return df.filter(datadog_search(query)).count() == 1


# (query, passing event, failing event) — mirrors the reference's
# get_checks() structure
CASES = [
    # match-all
    ("*", {"message": "foo"}, None),
    # attribute exists / missing
    ("_exists_:a", {"a": "foo"}, {}),
    ("NOT _exists_:a", {}, {"a": "foo"}),
    ("_missing_:a", {}, {"a": "foo"}),
    # keyword: word-boundary on the default field
    ("bla", {"message": "hello bla world"}, {"message": "blah"}),
    ('"bla"', {"message": "bla"}, {"message": "nothing here"}),
    ("NOT bla", {"message": "nothing"}, {"message": "bla"}),
    ('-"bla"', {"message": ""}, {"message": "bla"}),
    # facets: equality
    ("host:foo", {"host": "foo"}, {"host": "foobar"}),
    ('a:"bla"', {"a": "bla"}, {"a": "blab"}),
    ("NOT host:foo", {"host": "bar"}, {"host": "foo"}),
    ("-host:foo", {}, {"host": "foo"}),
    # booleans
    ("@flag:true", {"flag": True}, {"flag": False}),
    ("NOT @flag:false", {"flag": True}, {"flag": False}),
    # escaped specials in values
    (r"@a:va\ lue", {"a": "va lue"}, {"a": "value"}),
    (r"@a:va\*lue", {"a": "va*lue"}, {"a": "vaXlue"}),
    # wildcards
    ("host:foo*", {"host": "foobar"}, {"host": "barfoo"}),
    ("host:*foo", {"host": "barfoo"}, {"host": "foobar"}),
    ("host:f*o", {"host": "fxxxo"}, {"host": "fxxx"}),
    ("bl*", {"message": "hello blah"}, {"message": "hello ball"}),
    # numeric comparisons
    ("n:>5", {"n": 6.0}, {"n": 5.0}),
    ("n:>=5", {"n": 5.0}, {"n": 4.9}),
    ("n:<5", {"n": 4.0}, {"n": 5.0}),
    ("n:<=5", {"n": 5.0}, {"n": 5.1}),
    # ranges (numeric and string)
    ("n:[1 TO 5]", {"n": 5.0}, {"n": 5.5}),
    ("a:[a TO c]", {"a": "b"}, {"a": "d"}),
    # non-numeric comparison bound (Datadog accepts dates here):
    # lexicographic string comparison, not a crash
    ("status:>abc", {"status": "xyz"}, {"status": "aaa"}),
    ("a:<=2026-08-17", {"a": "2026-08-01"}, {"a": "2026-12-31"}),
    # boolean composition + parentheses + implicit AND
    ("host:foo AND n:>1", {"host": "foo", "n": 2.0}, {"host": "foo", "n": 0.5}),
    ("host:foo n:>1", {"host": "foo", "n": 2.0}, {"host": "bar", "n": 2.0}),
    ("host:foo OR n:>1", {"host": "bar", "n": 2.0}, {"host": "bar", "n": 0.0}),
    (
        "(host:a OR host:b) AND status:err",
        {"host": "b", "status": "err"},
        {"host": "c", "status": "err"},
    ),
    ("NOT (host:a OR host:b)", {"host": "c"}, {"host": "a"}),
]


@pytest.mark.parametrize("query,ok,bad", CASES,
                         ids=[c[0] for c in CASES])
def test_datadog_search_cases(spark, query, ok, bad):
    assert _matches(spark, query, ok), f"{query!r} should match {ok!r}"
    if bad is not None:
        assert not _matches(spark, query, bad), (
            f"{query!r} should NOT match {bad!r}"
        )


def test_null_fields_never_match_but_negation_does(spark):
    # SQL ternary logic must not leak: NOT host:foo on a null host is
    # TRUE (Datadog semantics), host:foo on a null host is FALSE
    assert not _matches(spark, "host:foo", {})
    assert _matches(spark, "NOT host:foo", {})


def test_compiles_to_column_usable_in_route(spark):
    from vector_spark.operators.route import route

    df = spark.createDataFrame(
        [("m1", "web", 7.0), ("m2", "db", 1.0)],
        "message string, host string, n double",
    )
    sinks = route(df, {"hot": datadog_search("host:web AND n:>5")})
    assert [r["message"] for r in sinks["hot"].collect()] == ["m1"]


TAG_CASES = [
    # (query, matching ddtags/source, non-matching ddtags/source) —
    # mirrors datadog_search.rs EventFilter Field::Tag / Reserved(tags)
    ("env:prod", (["env:prod"], None), (["env:staging"], None)),
    ("env:pro*", (["env:prod"], None), (["env:dev"], None)),
    ('env:"pr od"', (["env:pr od"], None), (["env:prod"], None)),
    ("_exists_:env", (["env"], None), (["other:x"], None)),
    ("_exists_:env", (["env:prod"], None), ([], None)),
    ("_missing_:env", (["other:x"], None), (["env:prod"], None)),
    ('tags:"env:prod"', (["env:prod"], None), (["env"], None)),
    ("tags:standalone", (["standalone"], None), (["standalone:x"], None)),
    # literal tags facet takes wildcards like every other facet
    ("tags:env*", (["env:prod"], None), (["other:x"], None)),
    ('tags:*:prod', (["env:prod"], None), (["envprod"], None)),
    ("version:>1.5", (["version:2"], None), (["version:1"], None)),
    ("version:<=2", (["version:2"], None), (["version:3"], None)),
    # reserved source matches source OR ddsource columns, not tags
    ("source:app", ([], "app"), ([], "web")),
    # @attr stays a column lookup even in tags mode
    ("@a:foo", ([], None, "foo"), ([], None, "bar")),
    # reserved host stays a column lookup
    ("host:h1", ([], None), ([], None)),
]


@pytest.mark.parametrize(
    "query,ok,bad", TAG_CASES,
    ids=[c[0] + f"#{i}" for i, c in enumerate(TAG_CASES)])
def test_datadog_tags_array_matching(spark, query, ok, bad):
    def matches(spec) -> bool:
        ddtags, source = spec[0], spec[1]
        a = spec[2] if len(spec) > 2 else None
        host = "h1" if query.startswith("host:") and spec is ok else "h2"
        df = spark.createDataFrame(
            [("msg", ddtags, source, None, a, host)],
            "message string, ddtags array<string>, source string, "
            "ddsource string, a string, host string",
        )
        return (
            df.filter(datadog_search(query, tags_cols=("ddtags",))).count()
            == 1
        )

    assert matches(ok), f"{query} should match {ok}"
    assert not matches(bad), f"{query} should not match {bad}"


def test_tags_mode_multiple_tag_columns(spark):
    """Both ddtags and tags arrays are consulted, like the
    reference's any_string_match_multiple(["ddtags", "tags"])."""
    df = spark.createDataFrame(
        [("a", ["env:prod"], []), ("b", [], ["env:prod"]), ("c", [], [])],
        "message string, ddtags array<string>, tags array<string>",
    )
    got = sorted(
        r["message"]
        for r in df.filter(
            datadog_search("env:prod", tags_cols=("ddtags", "tags"))
        ).collect()
    )
    assert got == ["a", "b"]


def test_source_facet_on_frame_missing_ddsource(spark):
    """Frames commonly carry only one of source/ddsource; passing the
    frame's column set makes the reserved source facet compile the
    absent column to no-match instead of failing analysis."""
    df = spark.createDataFrame(
        [("m1", ["t"], "app"), ("m2", ["t"], "web")],
        "message string, ddtags array<string>, source string",
    )
    cond = datadog_search(
        "source:app", tags_cols=("ddtags",), columns=set(df.columns)
    )
    assert [r["message"] for r in df.filter(cond).collect()] == ["m1"]

    # ddsource-only frame: same query, other column present
    df2 = spark.createDataFrame(
        [("m3", ["t"], "app")],
        "message string, ddtags array<string>, ddsource string",
    )
    cond2 = datadog_search(
        "source:app", tags_cols=("ddtags",), columns=set(df2.columns)
    )
    assert df2.filter(cond2).count() == 1


def test_syntax_errors_raise():
    with pytest.raises(ValueError):
        datadog_search("(host:foo")


def test_keyword_on_frame_missing_default_field(spark):
    """Free-text terms go through the resolver too: with columns=, a
    frame lacking the default field compiles keywords to no-match
    instead of failing analysis."""
    df = spark.createDataFrame(
        [("app", ["env:prod"])], "source string, ddtags array<string>"
    )
    cond = datadog_search(
        "error OR source:app", tags_cols=("ddtags",),
        columns=set(df.columns),
    )
    assert df.filter(cond).count() == 1  # via the facet, not the keyword
    cond2 = datadog_search("error", columns=set(df.columns))
    assert df.filter(cond2).count() == 0


def test_resolver_and_columns_are_mutually_exclusive():
    with pytest.raises(ValueError, match="not both"):
        datadog_search("a:b", resolver=lambda n: F.col(n), columns={"a"})
