"""Driver contract for the spark-graft builder (PySpark target).

All queries live in ``flink_engagement_pipeline_spark.plans`` (the query
registry); this module only adapts the registry to the driver's
``entry`` / ``queries`` / ``oracle_sql`` contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_engagement_pipeline_spark import plans

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "enrich_events"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's core enrichment query (reference
    src/process.py:163-183): broadcast LEFT lookup join + derived
    engagement metrics.
    """
    return plans.REGISTRY[FLAGSHIP].spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return plans.all_oracle_sql()
