"""Table-maintenance and layout tests: small-file compaction, schema
evolution on read."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_fraud_detection_system_using_big_data_analytics_spark.sources.maintenance import (
    compact_parquet,
)


def test_compact_parquet_reduces_files_and_preserves_rows(spark, tmp_path):
    """A directory of 40 tiny files compacts to the target count without
    a shuffle, and the data round-trips exactly."""
    out = str(tmp_path / "t")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.mode("overwrite").parquet(out)

    stats = compact_parquet(spark, out, target_bytes=128 * 1024 * 1024)
    assert stats["files_before"] == 40
    assert stats["files_after"] == stats["n_files_target"] == 1

    back = spark.read.parquet(out)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).collect()[0][0] == 2 * sum(range(10_000))


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """Schema evolution the parquet way: a new column appears in later
    files; mergeSchema unifies the read schema and old rows surface NULL —
    the contract an append-only 100 TB table relies on when producers
    upgrade before readers."""
    root = tmp_path / "evo"
    spark.createDataFrame([(1, "a")], "id long, a string").write.parquet(
        str(root / "d=1")
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, a string, score double"
    ).write.parquet(str(root / "d=2"))

    df = spark.read.option("mergeSchema", "true").parquet(str(root))
    assert set(df.columns) == {"id", "a", "score", "d"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["score"] is None
    assert rows[2]["score"] == 9.5
