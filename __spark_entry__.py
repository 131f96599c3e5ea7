"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``wistia_etl_pipeline_spark.registry``, which holds the
operator inventory (SURVEY.md §2) as named queries + DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from wistia_etl_pipeline_spark import registry
from wistia_etl_pipeline_spark.session import apply_runtime_confs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the gold daily engagement rollup (SURVEY.md EP3,
    aggregates A1-A6) on /root/testdata/sf0.001."""
    apply_runtime_confs(spark)
    return registry.queries()["gold_daily_rollup"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (same aliases)."""
    return registry.oracle_sql()
