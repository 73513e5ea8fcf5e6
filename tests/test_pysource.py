"""Custom Python DataSource (PySpark 4 datasource API) tests: batch
partition planning, Arrow-batch delivery, deterministic regeneration,
and the streaming source's offset contract (SURVEY §2.1 widening —
source surfaces beyond the built-in readers)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_fraud_detection_system_using_big_data_analytics_spark.sources.pysource import (
    register_python_datasource,
    register_python_stream_datasource,
)


def test_batch_source_partition_planning(spark):
    """n_partitions drives genuine parallelism (one InputPartition per
    range slice) and every declared row arrives exactly once."""
    register_python_datasource(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", "1003")
        .option("n_partitions", "4")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1003
    ids = df.agg(
        F.count_distinct("event_id").alias("d"),
        F.min("event_id").alias("lo"),
        F.max("event_id").alias("hi"),
    ).first()
    assert (ids["d"], ids["lo"], ids["hi"]) == (1003, 0, 1002)


def test_batch_source_formula_matches_sql(spark):
    """The source's rows equal the same formula computed in Catalyst over
    range() — the DataSource plumbing adds/loses/mangles nothing."""
    register_python_datasource(spark)
    got = (
        spark.read.format("synthetic_events")
        .option("n_rows", "500")
        .option("n_partitions", "3")
        .load()
    )
    types = F.array(*[F.lit(t) for t in ["view", "click", "purchase", "signup", "error"]])
    want = spark.range(0, 500).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 97).alias("user_id"),
        F.element_at(types, (F.col("id") % 5 + 1).cast("int")).alias("event_type"),
        ((F.col("id") * 31 % 9000 + 100) / 10.0).alias("value"),
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_stream_source_offset_contract(spark):
    """availableNow over the finite streaming source terminates having
    read exactly [0, 5000) once; a second availableNow run from the same
    checkpoint reads nothing new (offsets committed)."""
    import tempfile
    import uuid

    register_python_stream_datasource(spark)
    ckpt = tempfile.mkdtemp(prefix="ckpt_pysrc_test_")
    name = "pysrc_t_" + uuid.uuid4().hex[:8]
    stream = spark.readStream.format("synthetic_events_stream").load()
    # distinct aggs are unsupported on streams: pin the exact id set via
    # (count, sum, sum of squares) — any duplicate/missing combination
    # that preserves count and sum breaks the quadratic moment
    agg = stream.agg(
        F.count("*").alias("n"),
        F.sum("event_id").alias("s1"),
        F.sum(F.col("event_id") * F.col("event_id")).alias("s2"),
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    row = spark.table(name).first()
    n = 5000
    assert row["n"] == n
    assert row["s1"] == n * (n - 1) // 2
    assert row["s2"] == (n - 1) * n * (2 * n - 1) // 6

    # restart from the committed checkpoint: no re-read
    name2 = name + "_b"
    q2 = (
        spark.readStream.format("synthetic_events_stream")
        .load()
        .groupBy()
        .count()
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name2)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    n2 = spark.table(name2).count()
    assert n2 == 0 or spark.table(name2).first()["count"] == 5000
