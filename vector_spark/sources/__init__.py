from vector_spark.sources.readers import (  # noqa: F401
    line_agg,
    read_source,
    read_text_decoded,
)
from vector_spark.sources.sinks import (  # noqa: F401
    blackhole,
    fan_out_write,
    write_sink,
)
