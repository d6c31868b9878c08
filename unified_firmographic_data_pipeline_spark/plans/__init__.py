"""Model graph + the firmographic pipeline (SURVEY.md §3)."""

from unified_firmographic_data_pipeline_spark.plans.graph import ModelGraph, model

__all__ = ["ModelGraph", "model"]
