"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the package; this file only exposes the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from real_time_fraud_detection_system_using_big_data_analytics_spark.plans import registry


def _loaded_registry():
    registry.load_all()
    return registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q1-shaped pricing summary: scan -> pushed filter -> single-pass
    grouped multi-aggregate -> sort (the A1/A2/A5 + P1/P6 shapes of
    SURVEY §2.2-2.3 in one plan).
    """
    reg = _loaded_registry()
    return reg.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_loaded_registry().QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL for each SQL-expressible query."""
    return dict(_loaded_registry().ORACLE)
