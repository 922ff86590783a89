"""Config-level unit-test harness — the `vector test` analogue.

The reference lets users test their pipeline configs declaratively
(/root/reference/src/config/unit_test/mod.rs:51-100): a ``tests:``
block lists inputs to INSERT at a component, outputs to EXTRACT from a
component, boolean CONDITIONS each extracted event must satisfy, and
components expected to emit NOTHING (``no_outputs_from``).  Real
sources/sinks are replaced with synthetic ones
(unit_test_components.rs).

Spark re-expression: inserted rows become a createDataFrame source
injected in place of the named component; conditions are SQL boolean
expressions evaluated over the extracted frame; assertions run eagerly
and report per-test results.  Example corpus the shape mirrors:
/root/reference/tests/behavior/transforms/route.yaml:25-66.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession, functions as F

from vector_spark.config import _resolve_input


@dataclass
class TestResult:
    name: str
    passed: bool
    failures: list[str] = field(default_factory=list)


def run_config_tests(
    spark: SparkSession, config: dict
) -> list[TestResult]:
    """Execute every test block in ``config['tests']``.

    Test block schema::

        {"name": str,
         "inputs": [{"insert_at": component, "rows": [dict...],
                     "schema": ddl-string}],
         "outputs": [{"extract_from": "component[.port]",
                      "conditions": [sql_bool, ...],
                      "expect_rows": int | None}],
         "no_outputs_from": ["component[.port]", ...]}
    """
    results: list[TestResult] = []
    for test in config.get("tests", []):
        name = test.get("name", "unnamed")
        failures: list[str] = []

        # synthesize sources: replace the insert_at component entirely.
        # rows are written as plain strings/numbers in the config, so
        # build untyped then cast to the declared schema (lets tests
        # write timestamps as '2026-01-01 00:00:00')
        injected = {}
        for inp in test.get("inputs", []):
            from pyspark.sql import types as T

            schema = T._parse_datatype_string(inp["schema"])
            raw = spark.createDataFrame(
                [tuple(str(r[f.name]) if r[f.name] is not None else None
                       for f in schema.fields)
                 for r in inp["rows"]],
                ", ".join(f"{f.name} string" for f in schema.fields),
            )
            injected[inp["insert_at"]] = raw.select(
                *[F.col(f.name).cast(f.dataType).alias(f.name)
                  for f in schema.fields]
            )

        cfg = {
            "sources": {
                k: v
                for k, v in config.get("sources", {}).items()
                if k not in injected
            },
            "transforms": {
                k: v
                for k, v in config.get("transforms", {}).items()
                if k not in injected
            },
        }
        topo = _rebuild(spark, cfg, injected)

        for out in test.get("outputs", []):
            ref = out["extract_from"]
            try:
                df = _resolve_input(topo, ref)
            except Exception as exc:
                failures.append(f"{ref}: {exc}")
                continue
            total = df.count()
            if out.get("expect_rows") is not None and total != out["expect_rows"]:
                failures.append(
                    f"{ref}: expected {out['expect_rows']} rows, got {total}"
                )
            for cond in out.get("conditions", []):
                bad = df.filter(~F.coalesce(F.expr(cond), F.lit(False))).count()
                if bad:
                    failures.append(
                        f"{ref}: {bad}/{total} rows violate condition {cond!r}"
                    )
            if total == 0 and out.get("conditions") and out.get("expect_rows") is None:
                failures.append(f"{ref}: no rows extracted (vacuous pass refused)")

        for ref in test.get("no_outputs_from", []):
            try:
                df = _resolve_input(topo, ref)
            except Exception as exc:
                failures.append(f"{ref}: {exc}")
                continue
            n = df.count()
            if n:
                failures.append(f"{ref}: expected no output, got {n} rows")

        results.append(TestResult(name, not failures, failures))
    return results


def _rebuild(spark: SparkSession, cfg: dict, injected: dict) -> dict:
    """Build the topology with injected frames standing in as sources."""
    from vector_spark.config import _build_source, _build_transform, _union_inputs, ConfigError, PortAddressError

    results: dict = dict(injected)
    for name, scfg in cfg.get("sources", {}).items():
        if name not in results:
            results[name] = _build_source(spark, scfg)
    remaining = dict(cfg.get("transforms", {}))
    progress = True
    while remaining and progress:
        progress = False
        for name in list(remaining):
            tcfg = remaining[name]
            try:
                inp = _union_inputs(results, tcfg["inputs"])
            except PortAddressError:
                raise
            except ConfigError:
                continue
            out = _build_transform(spark, tcfg, inp)
            if isinstance(out, dict) and "__default__" in out:
                results[name] = out["__default__"]
                for port, df in out.items():
                    if port != "__default__":
                        results[f"{name}.{port}"] = df
            else:
                results[name] = out
            del remaining[name]
            progress = True
    return results
