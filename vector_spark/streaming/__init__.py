from vector_spark.streaming.pipeline import (  # noqa: F401
    run_to_memory,
    session_reduce_stream,
    stateful_running_count,
    stream_transcripts,
    streaming_sink_stats,
)
