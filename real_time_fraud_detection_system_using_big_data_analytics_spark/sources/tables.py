"""Parquet table catalog for the driver's synthetic star schema.

The reference loads its one table with schema inference
(fraud_detection_model.py:76 ``spark.read.csv(..., inferSchema=True)`` — two
passes over the data). Here every table is parquet (schema embedded, single
footer read, column pruning + predicate pushdown for free) and gets a temp
view so both the DataFrame API and ``spark.sql`` paths work.

At scale: parquet scans are the entry point for partition pruning and
pushdown; loading is lazy so registering all ten views costs only footer
reads.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TABLE_NAMES,
    register: bool = True,
) -> dict[str, DataFrame]:
    """Load the synthetic tables under ``sf_dir`` and register temp views.

    Pins the session timezone to UTC first so TimestampType render/compare
    is stable regardless of who created the session.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # events.ts is parquet TIMESTAMP(NANOS); Spark has no ns timestamps, so
    # read it as a raw long and truncate to micros — identical to DuckDB's
    # ns -> us truncation, keeping oracle comparisons exact.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    dfs: dict[str, DataFrame] = {}
    for name in names:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            df = df.select("event_id", "ts", "user_id", "event_type", "value", "props")
        if register:
            df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
