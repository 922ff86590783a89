"""Condition sub-language → Spark Column predicates.

Reference: ``Condition = IsLog | IsMetric | IsTrace | Vrl(program) |
DatadogSearch | AlwaysPass | AlwaysFail``
(/root/reference/src/conditions/mod.rs:26-51).  VRL conditions must
resolve to boolean (/root/reference/src/conditions/vrl.rs:99-160).

Spark-first: a condition IS a boolean Column.  The VRL predicate
becomes a Spark SQL expression string (Catalyst-analyzed, codegen'd);
is_log/is_metric discriminate on a `kind` column when events of mixed
kinds share a frame.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

ConditionLike = "Column | str | bool"


def to_condition(cond: "Column | str | bool | dict") -> Column:
    """Normalize a condition spec into a boolean Column.

    - Column  → as-is (must be boolean)
    - str     → Spark SQL expression (the VRL-predicate analogue)
    - bool    → AlwaysPass / AlwaysFail
    - dict    → typed condition like the reference's AnyCondition
      (conditions/mod.rs:26-51): ``{"type": "vrl"|"sql", "source":
      expr}`` or ``{"type": "datadog_search", "source": query}``
    """
    if isinstance(cond, Column):
        return cond
    if isinstance(cond, str):
        return F.expr(cond)
    if isinstance(cond, bool):
        return F.lit(cond)
    if isinstance(cond, dict):
        typ = cond.get("type", "sql")
        src = cond["source"]
        if typ in ("sql", "vrl"):
            return F.expr(src)
        if typ == "datadog_search":
            return datadog_search(
                src, default_field=cond.get("default_field", "message")
            )
        raise TypeError(f"unknown condition type {typ!r}")
    raise TypeError(f"not a condition: {cond!r}")


def datadog_search(query: str, **kwargs) -> Column:
    """The DatadogSearch condition variant — see
    :mod:`vector_spark.conditions_datadog`."""
    from vector_spark.conditions_datadog import datadog_search as _dd

    return _dd(query, **kwargs)


def is_kind(kind: str, kind_col: str = "kind") -> Column:
    """IsLog/IsMetric/IsTrace over a kind discriminator column."""
    return F.col(kind_col) == kind


def always_pass() -> Column:
    return F.lit(True)


def always_fail() -> Column:
    return F.lit(False)
