"""Catalog introspection (SURVEY §2.2 P8).

The reference interrogates Postgres's information_schema for column lists
and table existence before building its projection
(postgres_model_inference.py:196-206). Spark-side the catalog API answers
the same questions for registered tables/views; for remote JDBC tables the
portable equivalent of information_schema is a zero-row schema probe
(``WHERE 1=0``) — every JDBC database executes it against its own catalog
without reading data, so the introspection cost is one metadata round-trip
regardless of table size.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T


def table_exists(spark: SparkSession, name: str) -> bool:
    """EXISTS check over the session catalog (temp views, global views,
    catalog tables) — the Spark twin of the reference's
    ``SELECT EXISTS (SELECT FROM information_schema.tables ...)``."""
    return spark.catalog.tableExists(name)


def list_columns(spark: SparkSession, table: str) -> list[dict]:
    """Column inventory of a registered table/view: name, Spark SQL type
    string, nullability — the reference's
    ``SELECT column_name FROM information_schema.columns`` answer."""
    return [
        {"name": c.name, "type": c.dataType, "nullable": c.nullable}
        for c in spark.catalog.listColumns(table)
    ]


def remote_table_schema(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
) -> T.StructType:
    """Schema of a remote JDBC table without reading any rows: the pushed
    query is ``SELECT * FROM table WHERE 1=0`` so the database answers from
    its catalog. Works on every JDBC backend (no information_schema
    dialect differences)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"(SELECT * FROM {table} WHERE 1=0) probe")
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load().schema


def remote_table_exists(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
) -> bool:
    """Existence probe for a remote JDBC table (schema probe that treats
    'table not found' as False, any schema as True)."""
    try:
        remote_table_schema(spark, url, table, properties)
        return True
    except Exception:
        return False
