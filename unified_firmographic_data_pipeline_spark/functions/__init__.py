"""Scalar expression builders — ``Column -> Column`` functions.

The reference's only scalar extensibility is Jinja macros expanded into SQL
text (SURVEY.md §2.L). The Spark-native analogue is a plain Python function
that composes built-in ``pyspark.sql.functions`` expressions: zero
serialization cost, fully visible to Catalyst, and inlined into whole-stage
codegen. Nothing in this package is a UDF.
"""

from unified_firmographic_data_pipeline_spark.functions.cleaning import (
    first4_year,
    none_to_null,
    nullif_empty,
    parse_int_commas,
    parse_money,
    parse_pct,
    yes_no_to_bool,
)
from unified_firmographic_data_pipeline_spark.functions.keys import surrogate_key
from unified_firmographic_data_pipeline_spark.functions.text import (
    collapse_ws,
    doc_fingerprint,
    punct_ratio,
    stopword_count,
    token_count,
    tokens,
)
from unified_firmographic_data_pipeline_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
)

__all__ = [
    "parse_money",
    "parse_pct",
    "parse_int_commas",
    "yes_no_to_bool",
    "none_to_null",
    "nullif_empty",
    "first4_year",
    "surrogate_key",
    "tokens",
    "token_count",
    "stopword_count",
    "punct_ratio",
    "collapse_ws",
    "doc_fingerprint",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
