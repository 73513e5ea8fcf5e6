"""transformWithStateInPandas (Spark 4 next-gen stateful API) — env-gated
like the Kafka broker surface: the TWS Python state client requires
protobuf (pyspark.sql.streaming.proto.StateMessage_pb2 imports
google.protobuf). Since r13 the gate is UNLOCKED in this sandbox: the
package bootstraps the host's vendored google-cloud-sdk protobuf runtime
(session.bootstrap_vendored_protobuf) for driver and workers, so these
tests run the full multi-batch replay against the batch GROUP BY here
too; on a host with neither a protobuf install nor a vendored copy they
record a documented skip and pin the gate itself."""

from __future__ import annotations

import pytest

from real_time_fraud_detection_system_using_big_data_analytics_spark.plans import registry
from real_time_fraud_detection_system_using_big_data_analytics_spark.streaming.tws import (
    _protobuf_available,
)


def test_gate_matches_environment():
    """The registry must contain the TWS queries exactly when their
    protobuf dependency is importable — never a silent absence, never an
    unrunnable registration."""
    registry.load_all()
    avail = _protobuf_available()
    assert ("stream_transform_with_state" in registry.QUERIES) == avail
    assert ("stream_tws_topk_liststate" in registry.QUERIES) == avail


def test_tws_cumulative_profile_matches_batch(spark):
    pytest.importorskip(
        "google.protobuf",
        reason="TWS state client needs protobuf (deploy: pip install protobuf)",
    )
    from pyspark.sql import functions as F

    registry.load_all()
    got = registry.QUERIES["stream_transform_with_state"](
        spark, "/root/testdata/sf0.001"
    )
    want = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .cast("bigint")
            .alias("total_value_cents"),
            F.countDistinct("event_type").cast("bigint").alias("n_types"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("purchase_n"),
        )
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_tws_liststate_topk_matches_batch(spark):
    """The bounded-ListState top-K replay (r13) must equal the batch
    ROW_NUMBER top-K — multiset top-K is order-free, so this holds for
    any micro-batch partitioning, and n_seen pins that every event was
    consumed, not just the survivors."""
    pytest.importorskip(
        "google.protobuf",
        reason="TWS state client needs protobuf (deploy: pip install protobuf)",
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from real_time_fraud_detection_system_using_big_data_analytics_spark.streaming.tws import (
        TOPK_K,
    )

    registry.load_all()
    got = registry.QUERIES["stream_tws_topk_liststate"](spark, "/root/testdata/sf0.001")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", F.floor(F.col("value") * 100 + 0.5).cast("long").alias("c")
    )
    w = Window.partitionBy("user_id").orderBy(F.col("c").desc())
    want = (
        ev.withColumn("rn", F.row_number().over(w))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_seen"),
            F.sum(F.when(F.col("rn") <= TOPK_K, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("topk_sum_cents"),
            F.sum(F.when(F.col("rn") <= TOPK_K, 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
        )
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
