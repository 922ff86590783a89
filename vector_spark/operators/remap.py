"""Generic remap — expression-program transform with an error channel.

The reference's remap executes a compiled VRL program per event,
mutating fields, optionally dropping or rerouting failures to the
``dropped`` port (/root/reference/src/transforms/remap.rs:62-168 config,
:581-656 exec, :50 dropped port).  Assigning an array to the event root
explodes into N events (vrl_target.rs:170-197).

Spark re-expression: the "program" is an ordered set of column
assignments (Spark SQL expressions — the VRL-function surface in
functions/vrl.py provides the vocabulary).  Fallible expressions yield
null (try_cast semantics); an ``error_when`` condition routes rows to
the dropped frame with reason metadata, mirroring drop_on_error /
drop_on_abort (remap.rs:116-155).  ``explode_col`` reproduces the
array-to-root explode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from vector_spark.conditions import to_condition


class RemapResult:
    def __init__(self, main: DataFrame, dropped: DataFrame):
        self.main = main
        self.dropped = dropped

    def __iter__(self):
        return iter((self.main, self.dropped))


def remap(
    df: DataFrame,
    assignments: dict[str, Column | str],
    *,
    deletions: list[str] = (),
    error_when: Column | str | None = None,
    error_reason: str = "remap_error",
    abort_when: Column | str | None = None,
    explode_col: str | None = None,
    component: str = "remap",
) -> RemapResult:
    """Apply an expression program; split the error channel.

    - ``assignments``: new/overwritten columns (SQL strings or Columns),
      applied in insertion order so later assignments can reference
      earlier ones (VRL's sequential semantics).
    - ``deletions``: VRL ``del(.field)``.
    - ``error_when``: rows matching go to ``dropped`` with the ORIGINAL
      payload plus drop metadata (forward-original-on-error semantics).
    - ``abort_when``: VRL ``abort`` — rows silently dropped from both
      outputs when true (drop_on_abort).
    - ``explode_col``: array column exploded into N events afterwards.
    """
    out = df
    for name, expr in assignments.items():
        out = out.withColumn(
            name, expr if isinstance(expr, Column) else F.expr(expr)
        )
    if abort_when is not None:
        keep = ~F.coalesce(to_condition(abort_when), F.lit(False))
        out = out.filter(keep)
    if error_when is not None:
        # evaluated POST-assignment (the usual error signal is a null
        # produced by a fallible expression); the dropped frame keeps
        # the input's column set — original values except for columns
        # the program overwrote before failing
        err = F.coalesce(to_condition(error_when), F.lit(False))
        dropped = (
            out.filter(err)
            .select(*df.columns)
            .withColumn("_dropped_reason", F.lit(error_reason))
            .withColumn("_dropped_component", F.lit(component))
        )
        out = out.filter(~err)
    else:
        dropped = df.limit(0).withColumn(
            "_dropped_reason", F.lit(error_reason)
        ).withColumn("_dropped_component", F.lit(component))
    if deletions:
        out = out.drop(*deletions)
    if explode_col:
        out = out.withColumn(explode_col, F.explode(explode_col))
    return RemapResult(out, dropped)
