"""vector_spark — a PySpark-native log/telemetry pipeline engine.

A from-scratch reimplementation of the query semantics of the Vector
observability pipeline (reference: /root/reference, Rust) as an idiomatic
Spark DataFrame/SQL library: parse -> enrich -> route -> aggregate over
tables of multi-turn conversation/agent transcripts.

Design stance (NOT a port):
- Declarative DataFrame plans; Catalyst does pushdown/pruning/join choice.
- Vectorized pandas/Arrow UDFs only where built-ins can't express the op
  (grok named-group extraction); no per-row Python anywhere.
- Vector's processing-time flush semantics are re-specified as
  deterministic event-time windows so results are reproducible.
"""

__version__ = "0.1.0"

from vector_spark.session import get_spark  # noqa: F401
