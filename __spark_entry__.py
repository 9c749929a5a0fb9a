"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``kda_flink_demo_spark.registry`` — the driver's verify runs
``entry(spark)`` as a smoke check, runs each ``queries()[name]`` at sf=0.01 and
compares it against the matching ``oracle_sql()[name]`` via DuckDB (row-count +
schema + order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kda_flink_demo_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (1-minute tumbling count per class — the reference's
    StreamJobSqlTumbling contract) on /root/testdata/sf0.001."""
    return registry.queries()["tumbling_1m"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ LLM-pipeline ops)."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted → rows-only check)."""
    return registry.oracle_sql()
