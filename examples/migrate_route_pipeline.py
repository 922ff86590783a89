"""A Vector YAML pipeline and its vector_spark translation, side by
side.  The original config (the shape a reference user runs today):

    sources:
      logs:
        type: file
        include: ["/var/log/app/*.log"]

    transforms:
      parsed:
        type: remap
        inputs: [logs]
        source: |
          . |= parse_json!(.message) ?? parse_apache_log!(.message)

      routed:
        type: route
        inputs: [parsed]
        route:
          errors: '.level == "error" || .http_status >= 500'
          slow:
            type: datadog_search
            source: "latency_ms:>1500"

      error_rate:
        type: aggregate
        inputs: [routed.errors]
        interval_ms: 60000

    sinks:
      warehouse:
        type: parquet          # (any table sink)
        inputs: [error_rate, routed.slow]

Below: the same DAG through vector_spark's declarative topology.  Run:
``python examples/migrate_route_pipeline.py``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from vector_spark.config import build_topology
    from vector_spark.session import get_spark

    spark = get_spark("migrate_example", shuffle_partitions=8)

    cfg = {
        "sources": {
            # the demo input; swap for {"type": "text", "path": ...} +
            # read_text_multiline for real file tails
            "logs": {"type": "transcripts", "n_turns": 6000},
        },
        "transforms": {
            "parsed": {"type": "remap", "inputs": ["logs"]},
            "routed": {
                "type": "route",
                "inputs": ["parsed"],
                "routes": {
                    "errors": "level = 'error' OR http_status >= 500",
                    "slow": {
                        "type": "datadog_search",
                        "source": "latency_ms:>1500",
                    },
                },
            },
            "error_rate": {
                "type": "aggregate",
                "inputs": ["routed.errors"],
                "keys": ["role"],
                "specs": {"n": ["count", "*"]},
                "interval_secs": 60,
            },
        },
        "sinks": {},
    }

    outs = build_topology(spark, cfg)
    print("error windows :", outs["error_rate"].count())
    print("slow rows     :", outs["routed"]["slow"].count())
    print("unmatched     :", outs["routed"]["_unmatched"].count())
    outs["error_rate"].orderBy("window_start").show(5)


if __name__ == "__main__":
    main()
