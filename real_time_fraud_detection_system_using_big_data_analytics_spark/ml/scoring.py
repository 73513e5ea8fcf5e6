"""ML scoring queries for the registry (rows-only checks: LR training is
not SQL-expressible, SURVEY §5.2 risk #1).

The events table is mapped to a PaySim-ish feature frame (FIXTURES.md §5:
user_id≈account, event_type≈type, value≈amount) so the reference's exact
pipeline shape runs on the driver's synthetic data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_tables
from .fraud_pipeline import FraudPipeline


def as_transactions(ev: DataFrame) -> DataFrame:
    """Project an events frame (batch OR streaming — every expression here
    is stateless, so the same projection attaches to a readStream) onto the
    reference transaction schema. Deterministic label rule: high-value
    purchase, mirroring operators/fraud.py."""
    label = ((F.col("event_type") == "purchase") & (F.col("value") > 150.0)).cast("int")
    return ev.select(
        (F.hour("ts") + (F.dayofyear("ts") - 1) * 24).cast("int").alias("step"),
        F.col("event_type").alias("type"),
        F.col("value").alias("amount"),
        F.concat(F.lit("C"), F.col("user_id")).alias("nameOrig"),
        F.lit(0.0).alias("oldbalanceOrg"),
        F.lit(0.0).alias("newbalanceOrig"),
        F.concat(F.lit("M"), (F.col("event_id") % 100)).alias("nameDest"),
        F.lit(0.0).alias("oldbalanceDest"),
        F.lit(0.0).alias("newbalanceDest"),
        label.alias("isFraud"),
        F.lit(0).alias("isFlaggedFraud"),
    )


def events_as_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table -> reference transaction schema (batch)."""
    return as_transactions(load_tables(spark, sf_dir, names=("events",))["events"])


@register("ml_train_score_confusion")  # LR training: not SQL-expressible
def ml_train_score_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end reference pipeline on driver data: 80/20 split (seed=42,
    fraud_detection_model.py:86), weighted LR fit, score the held-out
    split, return the per-(prediction,label) cell counts — a stable 2x2
    schema for the rows-only check."""
    df = events_as_transactions(spark, sf_dir)
    train, test = df.randomSplit([0.8, 0.2], seed=42)
    fp = FraudPipeline()
    model = fp.fit(train)
    scored = FraudPipeline.score(model, test)
    return (
        scored.groupBy(
            F.col("fraud_prediction").alias("prediction"),
            F.col("isFraud").alias("label"),
        )
        .agg(F.count("*").alias("n"))
        .orderBy("prediction", "label")
    )


@register("ml_batch_inference")  # model scoring: not SQL-expressible
def ml_batch_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-inference parity (postgres_model_inference.py:224-348 without
    the driver-side pagination): train once, score the FULL table as one
    distributed transform, return flagged rows in the reference's
    prediction-output shape (:289-307)."""
    df = events_as_transactions(spark, sf_dir)
    fp = FraudPipeline()
    model = fp.fit(df)
    scored = FraudPipeline.score(model, df)
    return scored.filter(F.col("fraud_prediction") == 1).select(
        "nameOrig",
        "nameDest",
        F.col("amount"),
        F.col("fraud_prediction"),
        F.round("fraud_probability", 4).alias("fraud_probability"),
    )


@register("stream_ml_score")  # model scoring on a stream: not SQL-expressible
def stream_ml_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's central loop (spark_streaming_app.py:308-400),
    hermetic and fully in-plan: a fitted PipelineModel ``transform``s a
    STREAMING DataFrame — StringIndexer/OneHot/Assembler/Scaler/LR all
    execute inside the micro-batch plan, no foreachBatch collect — then
    predicted-fraud rows are projected to the reference's alert shape.
    This is the one reference capability the CLI's Kafka path exercises
    but no sandbox test could reach until now; the file-source replay
    proves model.transform composes with Structured Streaming in this
    engine. Rows-only check: LR weights are not SQL-expressible."""
    import tempfile
    import uuid

    from ..streaming.sources import events_file_stream

    model = FraudPipeline().fit(events_as_transactions(spark, sf_dir))
    tx_stream = as_transactions(events_file_stream(spark, sf_dir))
    scored = FraudPipeline.score(model, tx_stream)
    alerts = scored.filter(F.col("fraud_prediction") == 1).select(
        "nameOrig",
        "nameDest",
        F.round("amount", 2).alias("amount"),
        F.col("fraud_prediction").cast("int").alias("prediction"),
        F.round("fraud_probability", 4).alias("probability"),
    )
    name = "mlstream_" + uuid.uuid4().hex[:8]
    q = (
        alerts.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_mls_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@register("ml_evaluation_metrics")  # MLlib evaluator + LR training: not SQL-expressible
def ml_evaluation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full evaluation block (M8, fraud_detection_model.py
    :229-305) as one row: AUC via BinaryClassificationEvaluator plus
    accuracy/precision/recall/F1/confusion — computed from ONE cached
    transform and a single 5-aggregate pass, where the reference runs
    seven separate actions each replaying the full lineage."""
    df = events_as_transactions(spark, sf_dir)
    train, test = df.randomSplit([0.8, 0.2], seed=42)
    model = FraudPipeline().fit(train)
    m = FraudPipeline.evaluate(model, test)
    cm = m["confusion_matrix"]
    row = [
        (
            round(float(m["auc"]), 4),
            round(float(m["accuracy"]), 4),
            round(float(m["precision"]), 4),
            round(float(m["recall"]), 4),
            round(float(m["f1"]), 4),
            int(cm["tp"]), int(cm["fp"]), int(cm["tn"]), int(cm["fn"]),
            int(m["n"]),
        )
    ]
    return spark.createDataFrame(
        row, "auc double, accuracy double, precision double, recall double, "
             "f1 double, tp long, fp long, tn long, fn long, n long"
    )


@register("ml_gbt_train_score")  # tree-ensemble training: not SQL-expressible
def ml_gbt_train_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gradient-boosted-trees alternative to the reference's logistic
    regression: the SAME feature stages (index → one-hot → assemble; the
    scaler is dropped — trees split on raw thresholds, scaling is a
    no-op that costs a pass) with a seeded GBTClassifier head, evaluated
    on the identical 80/20 split. Output = the 2x2 confusion cells plus
    a model tag, the stable rows-only schema the LR twin uses
    (ml_train_score_confusion) so the two models are directly
    comparable.

    Engine point: swapping the model head is a one-stage Pipeline edit —
    the reference hard-wires LR into a 7-action script
    (fraud_detection_model.py:150-196). Scale: GBT training is iterative
    map-reduce over the cached feature frame (MLlib handles the
    persist); scoring remains one distributed transform."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import GBTClassifier
    from pyspark.ml.feature import OneHotEncoder, StringIndexer, VectorAssembler

    from .fraud_pipeline import NUMERIC_COLS

    df = events_as_transactions(spark, sf_dir)
    train, test = df.randomSplit([0.8, 0.2], seed=42)
    indexer = StringIndexer(
        inputCol="type", outputCol="type_indexed", handleInvalid="keep"
    )
    encoder = OneHotEncoder(inputCols=["type_indexed"], outputCols=["type_encoded"])
    assembler = VectorAssembler(
        inputCols=["type_encoded"] + list(NUMERIC_COLS),
        outputCol="features",
        handleInvalid="keep",
    )
    gbt = GBTClassifier(
        featuresCol="features",
        labelCol="isFraud",
        maxIter=5,
        maxDepth=3,
        seed=42,
    )
    model = Pipeline(stages=[indexer, encoder, assembler, gbt]).fit(train)
    scored = model.transform(test)
    return (
        scored.groupBy(
            F.col("prediction").cast("int").alias("prediction"),
            F.col("isFraud").alias("label"),
        )
        .agg(F.count("*").alias("n"))
        .withColumn("model", F.lit("gbt"))
        .orderBy("prediction", "label")
    )


@register(
    "ml_train_rule_agreement",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           TRUE AS accuracy_ge_90,
           TRUE AS auc_ge_98
    FROM events
    """,
)
def ml_train_rule_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end TRAINING audit, oracle-hashable (r8; the
    ship-the-measurement conversion the sketch/RNG audits use): the label
    rule here is deterministic (high-value purchase), so a correctly
    trained pipeline must rediscover it almost perfectly — fit on the
    seed-42 80% split, score the FULL table (n is exactly COUNT(events),
    unlike the RNG-sized test split), and emit agreement bounds the
    DuckDB oracle pins to TRUE: accuracy >= 90% by integer
    cross-multiplication and full-table AUC >= 0.98 (measured 94.4-95.1%
    / 0.995-0.999 across sf0.001-0.1). This makes a silent training
    regression anywhere in the 5-stage pipeline (indexer drift, scaler
    stats, weight wiring, optimizer) a driver-visible value MISMATCH —
    the five reference-parity ML queries stay rows-only by design, but
    the capability they share is now value-checked every round, in the
    registry rather than only in tests/test_ml.py's golden pins.
    Reference anchor: fraud_detection_model.py:86,160-169."""
    df = events_as_transactions(spark, sf_dir)
    train, _ = df.randomSplit([0.8, 0.2], seed=42)
    model = FraudPipeline().fit(train)
    scored = FraudPipeline.score(model, df).select("fraud_prediction", "isFraud", "fraud_probability")
    agg = scored.agg(
        F.count("*").alias("n_total"),
        F.sum((F.col("fraud_prediction") == F.col("isFraud")).cast("long")).alias(
            "n_agree"
        ),
    )
    # exact full-table AUC via the rank-sum identity (one window pass),
    # same formulation as ml_auc_exact_ranksum — no evaluator RNG
    from pyspark.sql import Window

    ranked = scored.withColumn(
        "r", F.avg(F.row_number().over(Window.orderBy("fraud_probability")))
        .over(Window.partitionBy("fraud_probability"))
    )
    auc_parts = ranked.agg(
        F.sum(F.when(F.col("isFraud") == 1, F.col("r"))).alias("sum_r_pos"),
        F.sum(F.col("isFraud").cast("long")).alias("n_pos"),
        F.count("*").alias("n"),
    )
    return (
        agg.crossJoin(auc_parts)
        .select(
            F.col("n_total").cast("bigint").alias("n_total"),
            (F.col("n_agree") * 100 >= F.col("n_total") * 90).alias(
                "accuracy_ge_90"
            ),
            (
                (
                    F.col("sum_r_pos")
                    - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
                )
                / (F.col("n_pos") * (F.col("n") - F.col("n_pos")))
                >= 0.98
            ).alias("auc_ge_98"),
        )
    )
