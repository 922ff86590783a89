from vector_spark.plans.transcript_pipeline import (  # noqa: F401
    ROUTES,
    AGG_SPECS,
    enriched_transcripts,
    run_pipeline,
)
