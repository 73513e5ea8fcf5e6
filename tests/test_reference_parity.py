"""Reference-parity tests on PaySim-shaped fixtures (FIXTURES.md §1-§4):
the exact schemas, flows and semantics of the reference application, run
through the engine's components."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_fraud_detection_system_using_big_data_analytics_spark.ml import PAYSIM_SCHEMA
from real_time_fraud_detection_system_using_big_data_analytics_spark.sources.files import (
    read_paysim_csv,
    write_csv,
)

CSV_HEADER = (
    "step,type,amount,nameOrig,oldbalanceOrg,newbalanceOrig,"
    "nameDest,oldbalanceDest,newbalanceDest,isFraud,isFlaggedFraud"
)
ROWS = [
    "1,PAYMENT,9839.64,C1231006815,170136.0,160296.36,M1979787155,0.0,0.0,0,0",
    "1,TRANSFER,181.0,C1305486145,181.0,0.0,C553264065,0.0,0.0,1,0",
    "1,CASH_OUT,181.0,C840083671,181.0,0.0,C38997010,21182.0,0.0,1,0",
    "2,CASH_IN,229133.94,C905080434,15325.0,244458.94,C476402209,5083.0,51513.44,0,0",
    "2,DEBIT,5337.77,C712410124,41720.0,36382.23,C195600860,41898.0,40348.79,0,0",
]


@pytest.fixture()
def paysim_csv(tmp_path):
    p = tmp_path / "t.csv"
    p.write_text(CSV_HEADER + "\n" + "\n".join(ROWS) + "\n")
    return str(p)


def test_csv_scan_explicit_schema(spark, paysim_csv):
    """S1: reference-format CSV loads with the declared StructType (no
    inference pass), types match spark_streaming_app.py:33-45."""
    df = read_paysim_csv(spark, paysim_csv)
    assert df.schema == PAYSIM_SCHEMA
    rows = df.collect()
    assert len(rows) == 5
    assert {r["type"] for r in rows} == {"PAYMENT", "TRANSFER", "CASH_OUT", "CASH_IN", "DEBIT"}
    assert sum(r["isFraud"] for r in rows) == 2


def test_fraud_rows_are_full_drain_transfers(spark, paysim_csv):
    """The PaySim fraud pattern in the reference samples (t1.csv:4-5):
    fraud rows drain the origin balance (amount == oldbalanceOrg)."""
    df = read_paysim_csv(spark, paysim_csv)
    fraud = df.filter(F.col("isFraud") == 1)
    assert fraud.filter(F.col("amount") == F.col("oldbalanceOrg")).count() == fraud.count()


def test_alert_projection_schema(spark, paysim_csv):
    """Alert payload shape (spark_streaming_app.py:354-360):
    nameOrig, nameDest, amount, prediction, probability."""
    df = read_paysim_csv(spark, paysim_csv)
    alerts = df.filter(F.col("isFraud") == 1).select(
        "nameOrig",
        "nameDest",
        "amount",
        F.lit(1.0).alias("prediction"),
        F.least(F.col("amount") / 200000.0, F.lit(1.0)).alias("probability"),
    )
    assert alerts.columns == ["nameOrig", "nameDest", "amount", "prediction", "probability"]
    assert alerts.count() == 2


def test_distributed_csv_write_roundtrip(spark, paysim_csv, tmp_path):
    """S7 fix: distributed CSV write replaces toPandas().to_csv — roundtrip
    preserves rows."""
    df = read_paysim_csv(spark, paysim_csv)
    out = str(tmp_path / "out_csv")
    write_csv(df, out)
    back = read_paysim_csv(spark, f"{out}/*.csv")
    assert back.count() == df.count()
    assert back.select(F.sum("amount")).first()[0] == df.select(F.sum("amount")).first()[0]


def test_kafka_json_encode_roundtrip(spark, paysim_csv):
    """S9/S10: in-plan to_json(struct(*)) — the alert/producer payload —
    parses back to the identical row via from_json."""
    df = read_paysim_csv(spark, paysim_csv)
    encoded = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    decoded = encoded.select(
        F.from_json("value", PAYSIM_SCHEMA).alias("data")
    ).select("data.*")
    assert decoded.schema == PAYSIM_SCHEMA
    assert decoded.subtract(df).count() == 0 and df.subtract(decoded).count() == 0


def test_dynamic_partition_overwrite_replaces_only_touched_partitions(spark, tmp_path):
    """Incremental backfill: with partitionOverwriteMode=dynamic, an
    overwrite write that contains only one partition's data replaces ONLY
    that partition — the other partitions' files stay untouched (the
    reprocess-one-day pattern at 100 TB)."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "by_type")
    base = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "c")], "id long, part string"
    )
    base.write.partitionBy("part").mode("overwrite").parquet(out)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        patch = spark.createDataFrame([(30, "b"), (31, "b")], "id long, part string")
        patch.write.partitionBy("part").mode("overwrite").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    got = {
        (r["id"], r["part"]) for r in spark.read.parquet(out).collect()
    }
    assert got == {(1, "a"), (2, "a"), (30, "b"), (31, "b"), (4, "c")}
