from vector_spark.functions.grok import GROK_PATTERNS, grok_to_regex  # noqa: F401
from vector_spark.functions.parse import (  # noqa: F401
    PARSED_SCHEMA,
    parse_transcripts,
    regex_extract_struct,
    split_errors,
)
