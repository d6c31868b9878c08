"""Declarative data-quality suite (dbt test analogue, SURVEY.md §5)."""

from unified_firmographic_data_pipeline_spark.quality.expect import Expectation, expect

__all__ = ["expect", "Expectation"]
