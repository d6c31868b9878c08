"""Sources & sinks (SURVEY.md §2.A)."""

from unified_firmographic_data_pipeline_spark.sources.landing import read_json_landing
from unified_firmographic_data_pipeline_spark.sources.catalog import Catalog

__all__ = ["read_json_landing", "Catalog"]
