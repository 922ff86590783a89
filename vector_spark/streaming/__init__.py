from vector_spark.streaming.pipeline import (  # noqa: F401
    run_to_memory,
    session_reduce_stream,
    stateful_running_count,
    stream_dedupe,
    stream_throttle,
    stream_transcripts,
    streaming_sink_stats,
    write_stream_to_memory_table,
    write_stream_to_table,
)
