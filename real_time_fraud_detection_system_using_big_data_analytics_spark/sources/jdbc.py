"""JDBC ingestion/egress (SURVEY §2.1 S5/S8).

Replaces two reference patterns:
- ``postgres_model_inference.py:266-285``: driver-side OFFSET/LIMIT
  pagination through pandas — serial, driver-bound, and non-deterministic
  (no ORDER BY, SURVEY §4.1). Here: a partitioned JDBC scan on the numeric
  key — N executors read N disjoint key ranges in parallel, deterministic
  by construction.
- ``to_sql.py:40-62``: pandas chunked INSERT. Here: ``df.write.jdbc`` with
  ``batchsize`` — distributed inserts straight from executors.

No database server exists in this environment; these builders are
config-complete and unit-tested up to plan construction (the reader is
exercised against a real JDBC URL in deployment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 16,
    fetchsize: int = 10_000,
    properties: dict[str, str] | None = None,
):
    """Parallel deterministic JDBC scan keyed on a numeric column (the
    reference's surrogate ``id`` primary key, to_sql.py:16)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
        .option("fetchsize", str(fetchsize))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader


def write_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    properties: dict[str, str] | None = None,
):
    """Distributed JDBC write (replaces to_sql.py's pandas chunked
    insert)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    return writer
