"""The `vector test` analogue: declarative tests over a config topology
(mirrors /root/reference/tests/behavior/transforms/route.yaml shape)."""

from __future__ import annotations

from vector_spark.testing import run_config_tests

CONFIG = {
    "sources": {"in": {"type": "transcripts", "n_turns": 1000}},
    "transforms": {
        "routed": {
            "type": "route", "inputs": ["in"],
            "routes": {
                "early": "turn_idx < 2",
                "tools": "tool <> 'none'",
            },
        },
        "capped": {"type": "throttle", "inputs": ["in"], "threshold": 1,
                   "window_secs": 86400 * 365, "key_fields": ["conv_id"]},
    },
    "tests": [
        {
            "name": "route ports receive matching events only",
            "inputs": [{
                "insert_at": "in",
                "schema": "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
                "rows": [
                    {"conv_id": "c1", "turn_idx": 0, "role": "user",
                     "text": "hello", "tool": "none", "ts": "2026-01-01 00:00:00"},
                    {"conv_id": "c1", "turn_idx": 5, "role": "tool",
                     "text": "result", "tool": "search", "ts": "2026-01-01 00:01:00"},
                    {"conv_id": "c1", "turn_idx": 9, "role": "system",
                     "text": "meta", "tool": "none", "ts": "2026-01-01 00:02:00"},
                ],
            }],
            "outputs": [
                {"extract_from": "routed.early",
                 "conditions": ["turn_idx < 2"], "expect_rows": 1},
                {"extract_from": "routed.tools",
                 "conditions": ["tool <> 'none'", "role = 'tool'"],
                 "expect_rows": 1},
                {"extract_from": "routed._unmatched", "expect_rows": 1},
                {"extract_from": "capped", "expect_rows": 1},
            ],
        },
        {
            "name": "no tool events means empty tools port",
            "inputs": [{
                "insert_at": "in",
                "schema": "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
                "rows": [
                    {"conv_id": "c2", "turn_idx": 3, "role": "user",
                     "text": "x", "tool": "none", "ts": "2026-01-01 00:00:00"},
                ],
            }],
            "no_outputs_from": ["routed.tools", "routed.early"],
        },
        {
            "name": "deliberately failing test is reported",
            "inputs": [{
                "insert_at": "in",
                "schema": "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
                "rows": [
                    {"conv_id": "c3", "turn_idx": 0, "role": "user",
                     "text": "y", "tool": "none", "ts": "2026-01-01 00:00:00"},
                ],
            }],
            "outputs": [{"extract_from": "routed.early",
                         "conditions": ["role = 'assistant'"]}],
        },
    ],
}


def test_vector_style_config_tests(spark):
    results = run_config_tests(spark, CONFIG)
    by_name = {r.name: r for r in results}
    assert by_name["route ports receive matching events only"].passed, \
        by_name["route ports receive matching events only"].failures
    assert by_name["no tool events means empty tools port"].passed
    failing = by_name["deliberately failing test is reported"]
    assert not failing.passed
    assert "violate condition" in failing.failures[0]
