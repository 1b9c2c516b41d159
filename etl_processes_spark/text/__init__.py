"""Text/embedding pipeline (reference Latanova_v1.py:19-62, 194-226, 300-344).

Implemented in etl_processes_spark.text.embedding; re-exported here.
"""

from etl_processes_spark.text.embedding import (  # noqa: F401
    embed_entries,
    gen_text_column,
    knn_decode,
    text_profile,
    tokenize_expr,
    vectorise_udf,
)

__all__ = [
    "embed_entries",
    "gen_text_column",
    "knn_decode",
    "text_profile",
    "tokenize_expr",
    "vectorise_udf",
]
