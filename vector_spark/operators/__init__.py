from vector_spark.operators.aggregate import aggregate, diff, histogram, window_start  # noqa: F401
from vector_spark.operators.dedupe import dedupe  # noqa: F401
from vector_spark.operators.metrics import (  # noqa: F401
    delay,
    incremental_to_absolute,
    log_to_metric,
    metric_to_log,
    static_enrich,
    tag_cardinality_limit,
    trace_to_log,
)
from vector_spark.operators.memory_table import MemoryTable, TableFullError  # noqa: F401
from vector_spark.operators.remap import RemapResult, remap  # noqa: F401
from vector_spark.operators.reduce import (  # noqa: F401
    reduce_events,
    reduce_segments,
    sessionize,
    strategy_expr,
)
from vector_spark.operators.route import (  # noqa: F401
    UNMATCHED,
    exclusive_route,
    filter_events,
    route,
    route_tag_column,
)
from vector_spark.operators.sample import sample, sample_mod, sample_ratio  # noqa: F401
from vector_spark.operators.throttle import throttle  # noqa: F401
from vector_spark.operators.window_context import context_window  # noqa: F401
