"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the SURVEY.md §2 operator inventory with DuckDB
oracles (see ``unified_firmographic_data_pipeline_spark/plans/driver_queries.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from unified_firmographic_data_pipeline_spark.plans.driver_queries import ORACLES, QUERIES

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    q01 (pricing summary) — scan + pushed filter + partial/final hash agg —
    always returns the small flag-group matrix, so rows>0 at any sf.
    """
    return QUERIES["q01_pricing_summary"](spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each (SQL-expressible) query."""
    return dict(ORACLES)
