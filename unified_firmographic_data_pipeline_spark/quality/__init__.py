"""Declarative data-quality suite (dbt test analogue, SURVEY.md §5),
plus the profiling (``quality.profile``) and drift-detection
(``quality.drift``) layers built on the same one-pass-aggregate
discipline."""

from unified_firmographic_data_pipeline_spark.quality.drift import (
    categorical_psi,
    numeric_psi,
    schema_drift,
)
from unified_firmographic_data_pipeline_spark.quality.expect import Expectation, expect
from unified_firmographic_data_pipeline_spark.quality.profile import (
    frequent_values,
    numeric_histogram,
    profile_columns,
)

__all__ = [
    "expect",
    "Expectation",
    "profile_columns",
    "frequent_values",
    "numeric_histogram",
    "schema_drift",
    "numeric_psi",
    "categorical_psi",
]
