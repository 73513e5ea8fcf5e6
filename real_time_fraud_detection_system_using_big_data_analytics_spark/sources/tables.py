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

# Logical schema each table must present after loading. Guards against the
# testdata generator changing physical types under us (it moved events.ts
# from TIMESTAMP(NANOS) to TIMESTAMP(MICROS) between rounds): a drifted
# column costs one readable error here instead of dozens of opaque
# AnalysisExceptions downstream. Only types with one valid logical reading
# are pinned; ``ts`` is normalized by load_tables and checked post-fix.
EXPECTED_COLUMNS: dict[str, dict[str, str]] = {
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {"doc_id": "bigint", "text": "string", "lang": "string", "source": "string"},
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>"},
    # TPC-H fact tables: pin the columns whose physical type a generator
    # change would most plausibly move (dates/timestamps and money) — every
    # oracle was validated against exactly these readings
    "lineitem": {
        "l_orderkey": "bigint",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_shipdate": "timestamp_ntz",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
    },
    "customer": {"c_custkey": "bigint", "c_acctbal": "double"},
}


class SchemaDriftError(RuntimeError):
    """A loaded table's column types no longer match the pinned logical schema."""


def fan_out(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Redistribute a narrow input across all cores before compute-heavy
    per-row work (shingling, per-token hashing, 64-dim vector math).

    The driver's small-SF tables are single-row-group parquet files, so the
    scan is one task — and any expensive projection chained onto it runs on
    one core. A round-robin repartition is a tiny shuffle (the input is
    narrow by construction) that unlocks full parallelism for the expansion
    stage. At 100 TB the same pattern holds whenever a compute-dense stage
    follows a low-parallelism source (one kafka partition, a coalesced
    scan): pay a small shuffle to fan the work out.
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


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
    # Older driver testdata stored events.ts as parquet TIMESTAMP(NANOS);
    # Spark has no ns timestamps, so with nanosAsLong it surfaces as bigint.
    # Current testdata stores TIMESTAMP(MICROS) which reads natively as
    # timestamp. Branch on the column's actual dtype so both vintages load.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    dfs: dict[str, DataFrame] = {}
    for name in names:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            ts_type = dict(df.dtypes).get("ts")
            if ts_type == "bigint":
                # raw ns long -> truncate to micros (same as DuckDB's ns->us)
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            elif ts_type == "timestamp_ntz":
                # parquet TIMESTAMP(isAdjustedToUTC=false) infers as NTZ in
                # Spark 4; with the session tz pinned to UTC this cast keeps
                # the same wall-clock instant and gives every consumer one
                # uniform TimestampType
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
            df = df.select("event_id", "ts", "user_id", "event_type", "value", "props")
        expected = EXPECTED_COLUMNS.get(name)
        if expected is not None:
            actual = dict(df.dtypes)
            for col, want in expected.items():
                got = actual.get(col)
                if got != want:
                    raise SchemaDriftError(
                        f"table {name!r} column {col!r}: expected {want!r}, "
                        f"got {got!r} (testdata schema drifted under "
                        f"{sf_dir}; update sources/tables.py to handle it)"
                    )
        if register:
            df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
