from vector_spark.data.transcripts import (  # noqa: F401
    duckdb_transcripts_sql,
    load_transcripts,
    n_turns_for_sf_dir,
    spark_transcripts_sql,
    transcripts_df,
)
from vector_spark.data.lookup import tool_lookup_df, TOOL_LOOKUP_SQL  # noqa: F401
