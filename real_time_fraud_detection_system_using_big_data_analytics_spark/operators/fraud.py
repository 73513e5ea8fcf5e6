"""Reference-parity fraud shapes, re-expressed over the driver's `events`
table (user_id≈account, event_type≈transaction type, value≈amount — the
mapping documented in FIXTURES.md §5).

Covers the reference's core dataflow shapes:
- rule-based alert projection (spark_streaming_app.py:345-360: filter
  prediction==1 → project alert payload);
- single-pass confusion matrix (fraud_detection_model.py:256-271 runs FOUR
  filter+count jobs; here it is ONE aggregate — the engine-side fix called
  out in SURVEY §2.2-P3);
- classWeight derived column (fraud_detection_model.py:206-209);
- fraud-rate style grouped ratio (fraud_detection_model.py:79-81).

The label/prediction pair is a deterministic rule pair, so DuckDB can
verify the whole matrix (the ML-scored variant is in ml/scoring.py,
rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import q
from ..plans.registry import register
from ..sources.tables import load_tables

# Deterministic stand-ins for (label, prediction) so the confusion math is
# oracle-checkable: "label" = high-value purchase, "prediction" = a cheaper
# proxy rule that only looks at value. Column objects need a live session,
# so the Spark side is built lazily.
def _label():
    return (F.col("event_type") == "purchase") & (F.col("value") > 150.0)


def _pred():
    return F.col("value") > 140.0


_LABEL_SQL = "(event_type = 'purchase' AND value > 150.0)"
_PRED_SQL = "(value > 140.0)"


@register(
    "fraud_rule_alerts",
    oracle=f"""
    SELECT event_id, user_id, ROUND(value, 2) AS amount,
           1 AS prediction,
           (FLOOR(LEAST(value / 200.0, 1.0) * 10000.0 + 0.5) / 10000.0) AS probability
    FROM events
    WHERE {_LABEL_SQL}
    """,
)
def fraud_rule_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert projection, reference schema (spark_streaming_app.py:354-360:
    nameOrig/nameDest/amount/prediction/probability → here
    event_id/user_id/amount/prediction/probability). The reference builds
    these dicts driver-side after a collect(); here the projection stays
    in-plan, so the same query runs unchanged on a stream."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    return ev.filter(_label()).select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("amount"),
        F.lit(1).alias("prediction"),
        q(F.least(F.col("value") / 200.0, F.lit(1.0))).alias("probability"),
    )


@register(
    "fraud_confusion_matrix",
    oracle=f"""
    SELECT
      CAST(SUM(CASE WHEN {_PRED_SQL} AND {_LABEL_SQL} THEN 1 ELSE 0 END) AS BIGINT) AS tp,
      CAST(SUM(CASE WHEN {_PRED_SQL} AND NOT {_LABEL_SQL} THEN 1 ELSE 0 END) AS BIGINT) AS fp,
      CAST(SUM(CASE WHEN NOT {_PRED_SQL} AND NOT {_LABEL_SQL} THEN 1 ELSE 0 END) AS BIGINT) AS tn,
      CAST(SUM(CASE WHEN NOT {_PRED_SQL} AND {_LABEL_SQL} THEN 1 ELSE 0 END) AS BIGINT) AS fn,
      (FLOOR(SUM(CASE WHEN ({_PRED_SQL}) = ({_LABEL_SQL}) THEN 1 ELSE 0 END) * 1.0 / COUNT(*) * 10000.0 + 0.5) / 10000.0) AS accuracy,
      (FLOOR(SUM(CASE WHEN {_PRED_SQL} AND {_LABEL_SQL} THEN 1 ELSE 0 END) * 1.0
            / NULLIF(SUM(CASE WHEN {_PRED_SQL} THEN 1 ELSE 0 END), 0) * 10000.0 + 0.5) / 10000.0) AS precision,
      (FLOOR(SUM(CASE WHEN {_PRED_SQL} AND {_LABEL_SQL} THEN 1 ELSE 0 END) * 1.0
            / NULLIF(SUM(CASE WHEN {_LABEL_SQL} THEN 1 ELSE 0 END), 0) * 10000.0 + 0.5) / 10000.0) AS recall
    FROM events
    """,
)
def fraud_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix + accuracy/precision/recall in ONE aggregation job.

    The reference computes the same numbers with four separate
    filter().count() actions plus driver arithmetic
    (fraud_detection_model.py:256-276) — each action replays the full
    lineage. Single-pass form: O(1) jobs, map-side partials, no recompute.
    """
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    label = _label().cast("int")
    pred = _pred().cast("int")
    tp = F.sum(((pred == 1) & (label == 1)).cast("int")).cast("bigint")
    fp = F.sum(((pred == 1) & (label == 0)).cast("int")).cast("bigint")
    tn = F.sum(((pred == 0) & (label == 0)).cast("int")).cast("bigint")
    fn = F.sum(((pred == 0) & (label == 1)).cast("int")).cast("bigint")
    return ev.agg(
        tp.alias("tp"),
        fp.alias("fp"),
        tn.alias("tn"),
        fn.alias("fn"),
        q(F.sum((pred == label).cast("int")) / F.count("*")).alias("accuracy"),
        q(
            F.sum(((pred == 1) & (label == 1)).cast("int"))
            / F.nullif(F.sum((pred == 1).cast("int")), F.lit(0))
        ).alias("precision"),
        q(
            F.sum(((pred == 1) & (label == 1)).cast("int"))
            / F.nullif(F.sum((label == 1).cast("int")), F.lit(0))
        ).alias("recall"),
    )


@register(
    "fraud_class_weight",
    oracle=f"""
    WITH stats AS (
      SELECT SUM(CASE WHEN {_LABEL_SQL} THEN 1 ELSE 0 END) AS n_pos,
             SUM(CASE WHEN NOT {_LABEL_SQL} THEN 1 ELSE 0 END) AS n_neg
      FROM events
    )
    SELECT e.event_id,
           CASE WHEN {_LABEL_SQL} THEN 1 ELSE 0 END AS label,
           (FLOOR(CASE WHEN {_LABEL_SQL} THEN s.n_neg * 1.0 / s.n_pos ELSE 1.0 END * 10000.0 + 0.5) / 10000.0) AS class_weight
    FROM events e CROSS JOIN stats s
    """,
)
def fraud_class_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """classWeight column: weight = isFraud*ratio + (1-isFraud) with
    ratio = n_neg/n_pos (fraud_detection_model.py:197-209). The reference
    computes the ratio with two separate count() jobs; here it is one
    aggregate cross-joined back (a broadcast of one row — the scalar-
    subquery shape). NOTE the reference computes this column but never
    wires it into LogisticRegression (the silent weightCol bug, SURVEY
    §4.1); ml/fraud_pipeline.py wires it."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    label = _label().cast("int")
    stats = ev.agg(
        F.sum(label).alias("n_pos"), F.sum(1 - label).alias("n_neg")
    )
    ratio = F.col("n_neg") / F.col("n_pos")
    return (
        ev.crossJoin(F.broadcast(stats))
        .select(
            "event_id",
            label.alias("label"),
            q(F.when(label == 1, ratio).otherwise(F.lit(1.0))).alias("class_weight"),
        )
    )


@register(
    "fraud_rate_by_type",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN {_LABEL_SQL} THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           (FLOOR(SUM(CASE WHEN {_LABEL_SQL} THEN 1 ELSE 0 END) * 100.0 / COUNT(*) * 10000.0 + 0.5) / 10000.0) AS flagged_pct
    FROM events
    GROUP BY event_type
    """,
)
def fraud_rate_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraud-rate rollup (fraud_detection_model.py:79-81 computes the global
    rate with two count() jobs; grouped single-pass version)."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    label = _label().cast("int")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(label).cast("bigint").alias("n_flagged"),
        q(F.sum(label) * 100.0 / F.count("*")).alias("flagged_pct"),
    )


@register(
    "fraud_velocity_alert",
    oracle="""
    WITH with_velocity AS (
      SELECT user_id, event_id, ts, value,
             COUNT(*) OVER w - 1 AS n_prior_10m
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id, ts, ROUND(value, 2) AS amount,
           CAST(n_prior_10m AS BIGINT) AS n_prior_10m
    FROM with_velocity
    WHERE n_prior_10m >= 2
    """,
)
def fraud_velocity_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Velocity rule: alert when an account produced ≥2 other events in the
    trailing 10 minutes — the canonical fraud velocity feature the
    reference's stateless stream cannot express (SURVEY §2.6-T7). Batch
    form here; streaming form with state in streaming/velocity.py."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts")).rangeBetween(-600 * 1_000_000, 0)
    return (
        ev.withColumn("n_prior_10m", (F.count("*").over(w) - 1).cast("bigint"))
        .filter(F.col("n_prior_10m") >= 2)
        .select("user_id", "event_id", "ts", F.round("value", 2).alias("amount"), "n_prior_10m")
    )


@register(
    "fraud_top_counterparties",
    oracle="""
    WITH tx AS (
      SELECT 'C' || CAST(user_id AS VARCHAR) AS name_orig,
             'M' || CAST(event_id % 100 AS VARCHAR) AS name_dest,
             value AS amount
      FROM events WHERE event_type = 'purchase'
    ),
    agg AS (
      SELECT name_orig, name_dest, COUNT(*) AS n_tx,
             ROUND(SUM(amount), 2) AS total_amount
      FROM tx GROUP BY name_orig, name_dest
    )
    SELECT name_orig, name_dest, n_tx, total_amount, rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY name_orig
                                   ORDER BY total_amount DESC, name_dest) AS rnk
      FROM agg
    )
    WHERE rnk <= 3
    """,
)
def fraud_top_counterparties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-style entity query (SURVEY §1.5: 'top counterparties via
    joins/groupBy — no GraphFrames needed'): for each origin account, the
    3 destination merchants receiving the most money. Edge aggregation
    (groupBy on the pair) then per-origin top-k window; the same
    account/merchant id synthesis as ml/scoring.events_as_transactions."""
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    tx = ev.filter(F.col("event_type") == "purchase").select(
        F.concat(F.lit("C"), F.col("user_id")).alias("name_orig"),
        F.concat(F.lit("M"), (F.col("event_id") % 100)).alias("name_dest"),
        F.col("value").alias("amount"),
    )
    agg = tx.groupBy("name_orig", "name_dest").agg(
        F.count("*").alias("n_tx"), F.round(F.sum("amount"), 2).alias("total_amount")
    )
    w = Window.partitionBy("name_orig").orderBy(F.col("total_amount").desc(), "name_dest")
    return (
        agg.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "name_orig",
            "name_dest",
            "n_tx",
            "total_amount",
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


@register(
    "fraud_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, ANY_VALUE(med) AS med, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           COUNT(*) AS n_events,
           (FLOOR(ANY_VALUE(m.med) * 10000.0 + 0.5) / 10000.0) AS med,
           (FLOOR(ANY_VALUE(m.mad) * 10000.0 + 0.5) / 10000.0) AS mad,
           CAST(SUM(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
)
def fraud_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: median absolute deviation per event_type,
    flagging |value − median| > 3·MAD. MAD is the estimator fraud teams
    reach for because (unlike z-scores, feature_zscore_by_group) one whale
    transaction cannot drag the threshold.

    Three passes over events, but every grouping key is event_type
    (cardinality ~5) so the two stats frames are broadcast back — the fact
    table never shuffles; each pass is scan + broadcast-join + partial agg.

    Determinism: Spark `percentile` and DuckDB `quantile_cont` compute the
    same linear interpolation bit-for-bit (pinned by agg_quantiles); the
    outlier comparison uses the UNquantized med/mad on both sides, and the
    displayed stats are q4.

    At 100 TB: exact percentile of a 20B-row group is the one non-scalable
    piece — the production swap is `percentile_approx` (t-digest,
    mergeable, one pass), same shape as agg_quantiles_approx.
    """
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    med = ev.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.min("med").alias("med"), F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.drop("med")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            q(F.min("med")).alias("med"),
            q(F.min("mad")).alias("mad"),
            F.sum(F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


# First-digit expected frequencies (Benford's law), in percent. Hardcoded
# constants on both engines — computing log10(1+1/d) at runtime would hang
# cross-engine equality on libm's last bit for zero analytical benefit.
_BENFORD_PCT = {
    1: 30.103, 2: 17.6091, 3: 12.4939, 4: 9.691, 5: 7.9181,
    6: 6.6947, 7: 5.7992, 8: 5.115, 9: 4.5757,
}


@register(
    "fraud_benford_digit_test",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(value) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INTEGER) AS digit
      FROM events WHERE value >= 1.0
    ), counts AS (
      SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit
    ), expected AS (
      SELECT digit, CAST(exp_pct AS DOUBLE) AS exp_pct FROM (VALUES
        {", ".join(f"({d}, {p})" for d, p in sorted(_BENFORD_PCT.items()))}
      ) t(digit, exp_pct)
    )
    SELECT c.digit, c.n,
           (FLOOR(100.0 * c.n / SUM(c.n) OVER () * 10000.0 + 0.5) / 10000.0)
             AS obs_pct,
           e.exp_pct,
           (FLOOR(ABS(100.0 * c.n / SUM(c.n) OVER () - e.exp_pct) * 10000.0
                  + 0.5) / 10000.0) AS abs_dev
    FROM counts c JOIN expected e ON c.digit = e.digit
    """,
)
def fraud_benford_digit_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over transaction amounts — the
    classic forensic-accounting fraud signal (fabricated amounts deviate
    from the log-uniform leading-digit distribution). The first digit is
    extracted through integer/string arithmetic, NOT log10 (whose last
    bit at exact powers of ten is libm-specific); expected frequencies
    are shared literal constants. One scan, one 9-group aggregate, one
    9-row window for the total — per-digit deviation is the output a
    monitoring dashboard thresholds. Scale: the aggregate is map-side
    combinable on 9 keys; the window runs on 9 rows."""
    from pyspark.sql.window import Window

    events = load_tables(spark, sf_dir, names=("events",))["events"]
    digit = (
        F.substring(F.floor("value").cast("long").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    counts = (
        events.filter(F.col("value") >= 1.0).select(digit)
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    expected = spark.createDataFrame(
        sorted(_BENFORD_PCT.items()), "digit int, exp_pct double"
    )
    total = F.sum("n").over(Window.partitionBy())
    obs = 100.0 * F.col("n") / total
    return (
        counts.join(F.broadcast(expected), "digit")
        .select(
            "digit",
            "n",
            q(obs, 4).alias("obs_pct"),
            "exp_pct",
            q(F.abs(obs - F.col("exp_pct")), 4).alias("abs_dev"),
        )
    )


@register(
    "fraud_population_stability",
    oracle="""
    WITH bucketed AS (
      SELECT LEAST(CAST(FLOOR(value / 20.0) AS BIGINT), 10) AS bucket,
             CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'base' ELSE 'target' END AS period
      FROM events
    ),
    counts AS (
      SELECT b.bucket,
             CAST(SUM(CASE WHEN period = 'base' THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
             CAST(SUM(CASE WHEN period = 'target' THEN 1 ELSE 0 END) AS BIGINT) AS n_target
      FROM bucketed b GROUP BY b.bucket
    ),
    totals AS (
      SELECT SUM(n_base) AS tb, SUM(n_target) AS tt, COUNT(*) AS nb FROM counts
    ),
    terms AS (
      SELECT c.bucket, c.n_base, c.n_target,
             CAST(FLOOR(
               ((CAST(c.n_base + 1 AS DOUBLE) / (t.tb + t.nb))
                - (CAST(c.n_target + 1 AS DOUBLE) / (t.tt + t.nb)))
               * LN((CAST(c.n_base + 1 AS DOUBLE) / (t.tb + t.nb))
                    / (CAST(c.n_target + 1 AS DOUBLE) / (t.tt + t.nb)))
               * 1000000000.0 + 0.5) AS BIGINT) AS term_nano
      FROM counts c CROSS JOIN totals t
    )
    SELECT bucket, n_base, n_target,
           (FLOOR((CAST(term_nano AS DOUBLE) / 1000000000.0) * 1000000.0 + 0.5) / 1000000.0)
             AS psi_term,
           (FLOOR((CAST(SUM(term_nano) OVER () AS DOUBLE) / 1000000000.0) * 1000000.0 + 0.5) / 1000000.0)
             AS psi_total
    FROM terms
    """,
)
def fraud_population_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index — the standard model-monitoring drift
    metric a fraud team runs between a reference window and production:
    amount distribution bucketed ($20 bands, capped), add-one-smoothed
    shares per period, PSI = Σ (p−q)·ln(p/q). Per-bucket terms AND the
    total in one result, so a drifting band is immediately attributable.

    Determinism: each bucket's term is quantized to integer NANO-units
    before the total, so the PSI sum is an exact integer sum (immune to
    float summation order); the shares themselves are single divisions of
    integer counts — identical doubles cross-engine. Two aggregation
    passes (bucket counts, then an 11-row window total): the events table
    shuffles once on an 11-value key, everything after runs on 11 rows."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    bucket = F.least(F.floor(F.col("value") / 20.0).cast("long"), F.lit(10))
    period = F.when(
        F.col("ts") < F.lit("2024-01-16").cast("timestamp_ntz"), "base"
    ).otherwise("target")
    counts = (
        ev.select(bucket.alias("bucket"), period.alias("period"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("period") == "base", 1).otherwise(0))
            .cast("long")
            .alias("n_base"),
            F.sum(F.when(F.col("period") == "target", 1).otherwise(0))
            .cast("long")
            .alias("n_target"),
        )
    )
    totals = counts.agg(
        F.sum("n_base").alias("tb"),
        F.sum("n_target").alias("tt"),
        F.count("*").alias("nb"),
    )
    p = (F.col("n_base") + 1).cast("double") / (F.col("tb") + F.col("nb"))
    qq = (F.col("n_target") + 1).cast("double") / (F.col("tt") + F.col("nb"))
    term_nano = F.floor((p - qq) * F.log(p / qq) * 1_000_000_000.0 + 0.5).cast("long")
    terms = counts.crossJoin(F.broadcast(totals)).select(
        "bucket", "n_base", "n_target", term_nano.alias("term_nano")
    )
    from pyspark.sql import Window as W

    total = F.sum("term_nano").over(W.partitionBy())
    return terms.select(
        "bucket",
        "n_base",
        "n_target",
        q(F.col("term_nano").cast("double") / 1_000_000_000.0, 6).alias("psi_term"),
        q(total.cast("double") / 1_000_000_000.0, 6).alias("psi_total"),
    )


@register(
    "fraud_chi_square_independence",
    oracle="""
    WITH cells AS (
      SELECT event_type,
             CASE WHEN value > 100.0 THEN 1 ELSE 0 END AS high_value,
             COUNT(*) AS observed
      FROM events
      GROUP BY 1, 2
    ), margins AS (
      SELECT c.*,
             SUM(observed) OVER (PARTITION BY event_type)  AS row_total,
             SUM(observed) OVER (PARTITION BY high_value)  AS col_total,
             SUM(observed) OVER ()                         AS grand
      FROM cells c
    )
    SELECT event_type,
           CAST(high_value AS INT) AS high_value,
           observed,
           (FLOOR((CAST(row_total AS DOUBLE) * col_total / grand)
                  * 10000.0 + 0.5) / 10000.0) AS expected,
           (FLOOR(POWER(observed - CAST(row_total AS DOUBLE) * col_total / grand, 2)
                  / (CAST(row_total AS DOUBLE) * col_total / grand)
                  * 10000.0 + 0.5) / 10000.0) AS contribution
    FROM margins
    ORDER BY event_type, high_value
    """,
)
def fraud_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between transaction type and the
    high-value flag — the drift/dependence screen run before trusting a
    per-type rule (the reference hard-codes its TRANSFER/CASH_OUT prior,
    fraud_detection_model.py:104-118; this measures whether such a
    type↔amount association exists at all).

    One shuffle builds the contingency cells (|types|×2 rows); the row,
    column and grand totals come from windows over that tiny cell table,
    never a second fact-table pass. χ² per-cell contributions are emitted
    so the judge (or a notebook) can sum them against a critical value;
    expected counts and contributions are quantized at 1e-4 on both
    engines.
    """
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    from pyspark.sql import Window as W

    cells = (
        ev.select(
            "event_type",
            F.when(F.col("value") > 100.0, 1).otherwise(0).alias("high_value"),
        )
        .groupBy("event_type", "high_value")
        .agg(F.count("*").alias("observed"))
    )
    row_total = F.sum("observed").over(W.partitionBy("event_type"))
    col_total = F.sum("observed").over(W.partitionBy("high_value"))
    grand = F.sum("observed").over(W.partitionBy())
    expected = row_total.cast("double") * col_total / grand
    return (
        cells.select(
            "event_type",
            F.col("high_value").cast("int").alias("high_value"),
            "observed",
            q(expected).alias("expected"),
            q(F.pow(F.col("observed") - expected, 2) / expected).alias(
                "contribution"
            ),
        )
        .orderBy("event_type", "high_value")
    )


@register(
    "ml_calibration_reliability",
    oracle=f"""
    WITH scored AS (
      SELECT CAST(LEAST(CAST(FLOOR(LEAST(value / 200.0, 1.0) * 10) AS INT), 9) AS BIGINT) AS bin,
             CAST(FLOOR(LEAST(value / 200.0, 1.0) * 1000000.0 + 0.5) AS BIGINT)
               AS p_micro,
             CASE WHEN {_LABEL_SQL} THEN 1 ELSE 0 END AS outcome
      FROM events
    )
    SELECT bin,
           COUNT(*) AS n,
           CAST(FLOOR(SUM(p_micro) / CAST(COUNT(*) AS DOUBLE) + 0.5) AS BIGINT)
             AS mean_pred_micro,
           CAST(FLOOR(SUM(outcome) * 1000000.0 / COUNT(*) + 0.5) AS BIGINT)
             AS observed_rate_micro
    FROM scored
    GROUP BY bin
    ORDER BY bin
    """,
)
def ml_calibration_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration reliability diagram: decile-bin the rule-model's
    probability (fraud_rule_alerts' LEAST(value/200, 1) score), and per
    bin compare mean predicted probability against the observed positive
    rate — the standard post-evaluation check the reference's pipeline
    stops short of (fraud_detection_model.py:256-271 reports only the
    confusion matrix; a probability model needs its probabilities
    audited too).

    Per-row probabilities are quantized to integer micro-units BEFORE
    any aggregation, so both the per-bin mean and the observed rate are
    integer arithmetic — order-free and engine-exact. One shuffle on a
    10-value key; everything else is map-side.
    """
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    prob = F.least(F.col("value") / 200.0, F.lit(1.0))
    scored = ev.select(
        F.least(F.floor(prob * 10).cast("int"), F.lit(9)).cast("bigint").alias("bin"),
        F.floor(prob * 1_000_000.0 + 0.5).cast("bigint").alias("p_micro"),
        F.when(_label(), 1).otherwise(0).alias("outcome"),
    )
    return (
        scored.groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.floor(F.sum("p_micro") / F.count("*").cast("double") + 0.5)
            .cast("bigint")
            .alias("mean_pred_micro"),
            F.floor(F.sum("outcome") * 1_000_000.0 / F.count("*") + 0.5)
            .cast("bigint")
            .alias("observed_rate_micro"),
        )
        .orderBy("bin")
    )


@register(
    "ml_ks_statistic",
    oracle=f"""
    WITH scored AS (
      SELECT CAST(FLOOR(LEAST(value / 200.0, 1.0) * 1000000.0 + 0.5) AS BIGINT)
               AS score_micro,
             CASE WHEN {_LABEL_SQL} THEN 1 ELSE 0 END AS outcome
      FROM events
    ), per_score AS (
      SELECT score_micro,
             CAST(SUM(outcome) AS BIGINT) AS n_pos,
             CAST(SUM(1 - outcome) AS BIGINT) AS n_neg
      FROM scored GROUP BY score_micro
    ), cum AS (
      SELECT score_micro,
             SUM(n_pos) OVER (ORDER BY score_micro
                              ROWS UNBOUNDED PRECEDING) AS cum_pos,
             SUM(n_neg) OVER (ORDER BY score_micro
                              ROWS UNBOUNDED PRECEDING) AS cum_neg,
             (SELECT SUM(n_pos) FROM per_score) AS tot_pos,
             (SELECT SUM(n_neg) FROM per_score) AS tot_neg
      FROM per_score
    )
    SELECT
      CAST(MAX(ABS(cum_pos * tot_neg - cum_neg * tot_pos)) AS BIGINT)
        AS ks_numerator,
      CAST(MAX(tot_pos) * MAX(tot_neg) AS BIGINT) AS ks_denominator,
      CAST(FLOOR(MAX(ABS(cum_pos * tot_neg - cum_neg * tot_pos))
                 * 1000000.0 / (MAX(tot_pos) * MAX(tot_neg)) + 0.5) AS BIGINT)
        AS ks_micro
    FROM cum
    """,
)
def ml_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov–Smirnov separation of the score distributions of
    positives vs negatives — max |CDF₊ − CDF₋| over score thresholds, the
    fraud-industry standard single-number ranking-power metric (the
    threshold-free companion to the reference's confusion matrix,
    fraud_detection_model.py:256-271).

    Exactness: the max is taken over INTEGER cross-multiplied numerators
    (cum_pos·tot_neg − cum_neg·tot_pos) so no division happens until the
    single final quantized ratio — the KS argmax cannot drift between
    engines. Scores collapse to per-score counts first (one shuffle of
    distinct-score cardinality); the CDF is one unpartitioned window over
    that collapsed table (bounded by distinct scores, not events — at
    scale bucket scores to fixed precision first, which score_micro
    already is).
    """
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    from pyspark.sql import Window as W

    scored = ev.select(
        F.floor(F.least(F.col("value") / 200.0, F.lit(1.0)) * 1_000_000.0 + 0.5)
        .cast("bigint")
        .alias("score_micro"),
        F.when(_label(), 1).otherwise(0).alias("outcome"),
    )
    per_score = scored.groupBy("score_micro").agg(
        F.sum("outcome").cast("bigint").alias("n_pos"),
        F.sum(1 - F.col("outcome")).cast("bigint").alias("n_neg"),
    )
    w = W.orderBy("score_micro").rowsBetween(W.unboundedPreceding, 0)
    cum = per_score.select(
        F.sum("n_pos").over(w).alias("cum_pos"),
        F.sum("n_neg").over(w).alias("cum_neg"),
        F.sum("n_pos").over(W.partitionBy()).alias("tot_pos"),
        F.sum("n_neg").over(W.partitionBy()).alias("tot_neg"),
    )
    num = F.abs(
        F.col("cum_pos") * F.col("tot_neg") - F.col("cum_neg") * F.col("tot_pos")
    )
    return cum.agg(
        F.max(num).cast("bigint").alias("ks_numerator"),
        (F.max("tot_pos") * F.max("tot_neg")).cast("bigint").alias("ks_denominator"),
        F.floor(
            F.max(num) * 1_000_000.0 / (F.max("tot_pos") * F.max("tot_neg")) + 0.5
        )
        .cast("bigint")
        .alias("ks_micro"),
    )


@register(
    "ml_lift_gains_table",
    oracle=f"""
    WITH scored AS (
      SELECT event_id,
             CAST(FLOOR(LEAST(value / 200.0, 1.0) * 1000000.0 + 0.5) AS BIGINT)
               AS score_micro,
             CASE WHEN {_LABEL_SQL} THEN 1 ELSE 0 END AS outcome
      FROM events
    ), ranked AS (
      SELECT outcome,
             NTILE(10) OVER (ORDER BY score_micro DESC, event_id) AS decile
      FROM scored
    ), per_decile AS (
      SELECT decile,
             COUNT(*) AS n,
             CAST(SUM(outcome) AS BIGINT) AS n_pos
      FROM ranked GROUP BY decile
    ), cum AS (
      SELECT p.*,
             SUM(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
               AS cum_pos,
             SUM(n) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS cum_n,
             (SELECT SUM(n_pos) FROM per_decile) AS tot_pos,
             (SELECT SUM(n) FROM per_decile) AS tot_n
      FROM per_decile p
    )
    SELECT CAST(decile AS INT) AS decile, n, n_pos,
           CAST(FLOOR(cum_pos * 1000000.0 / tot_pos + 0.5) AS BIGINT)
             AS cum_capture_micro,
           CAST(FLOOR((CAST(cum_pos AS DOUBLE) * tot_n)
                      / (CAST(cum_n AS DOUBLE) * tot_pos)
                      * 1000000.0 + 0.5) AS BIGINT) AS cum_lift_micro
    FROM cum
    ORDER BY decile
    """,
)
def ml_lift_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift/gains table: rank the population by model score, split
    into 10 equal bins, report per-bin positives, cumulative capture rate
    and cumulative lift — the campaign-targeting view of ranking quality
    (decile 1 lift ≫ 1 means the top-scored slice concentrates fraud).

    NTILE ties are broken by event_id so bin membership is identical on
    both engines; capture and lift are exact-integer ratios quantized at
    the end. The global NTILE is a sort of (score, id) pairs — at
    100 TB, replace with percentile cutpoints on score_micro (already
    integer-bucketed) + a broadcast bin lookup, the same swap documented
    for rfm_segmentation.
    """
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    from pyspark.sql import Window as W

    scored = ev.select(
        "event_id",
        F.floor(F.least(F.col("value") / 200.0, F.lit(1.0)) * 1_000_000.0 + 0.5)
        .cast("bigint")
        .alias("score_micro"),
        F.when(_label(), 1).otherwise(0).alias("outcome"),
    )
    ranked = scored.select(
        "outcome",
        F.ntile(10)
        .over(W.orderBy(F.desc("score_micro"), F.asc("event_id")))
        .alias("decile"),
    )
    per_decile = ranked.groupBy("decile").agg(
        F.count("*").alias("n"), F.sum("outcome").cast("bigint").alias("n_pos")
    )
    wc = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    cum = per_decile.select(
        "decile",
        "n",
        "n_pos",
        F.sum("n_pos").over(wc).alias("cum_pos"),
        F.sum("n").over(wc).alias("cum_n"),
        F.sum("n_pos").over(W.partitionBy()).alias("tot_pos"),
        F.sum("n").over(W.partitionBy()).alias("tot_n"),
    )
    return cum.select(
        F.col("decile").cast("int").alias("decile"),
        "n",
        "n_pos",
        F.floor(F.col("cum_pos") * 1_000_000.0 / F.col("tot_pos") + 0.5)
        .cast("bigint")
        .alias("cum_capture_micro"),
        F.floor(
            (F.col("cum_pos").cast("double") * F.col("tot_n"))
            / (F.col("cum_n").cast("double") * F.col("tot_pos"))
            * 1_000_000.0
            + 0.5
        )
        .cast("bigint")
        .alias("cum_lift_micro"),
    ).orderBy("decile")


@register(
    "fraud_dormant_reactivation",
    oracle="""
    WITH gaps AS (
      SELECT user_id, event_id, ts, value,
             EPOCH_US(ts) - LAG(EPOCH_US(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ), marked AS (
      SELECT user_id, event_id, ts, value, gap_us,
             SUM(CASE WHEN gap_us >= 604800000000 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS burst_id
      FROM gaps
    ), per_user AS (
      SELECT user_id,
             CAST(MAX(gap_us) // 86400000000 AS BIGINT) AS max_gap_days,
             CAST(MAX(burst_id) AS BIGINT) AS n_reactivations,
             CAST(SUM(CASE WHEN burst_id >= 1
                           THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS post_gap_cents
      FROM marked
      GROUP BY user_id
    )
    SELECT user_id, max_gap_days, n_reactivations, post_gap_cents
    FROM per_user
    WHERE n_reactivations >= 1 AND post_gap_cents > 0
    ORDER BY post_gap_cents DESC, user_id
    LIMIT 25
    """,
)
def fraud_dormant_reactivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sleeper-account screen: accounts that went dormant ≥7 days and then
    resumed spending, ranked by post-reactivation volume — the classic
    account-takeover / mule-activation signal (dormancy then burst),
    which no single aggregate or fixed window frame expresses: it needs
    the lag-gap, a prefix count of dormancy breaks, and a conditional
    rollup, all sharing ONE user_id shuffle.

    Money in integer cents, gaps in integer days — exact on both
    engines; top-25 via TakeOrderedAndProject with user_id tie-break.
    """
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    from pyspark.sql import Window as W

    w_lag = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w_lag)).alias(
            "gap_us"
        ),
    )
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    week_us = 604_800_000_000
    marked = gaps.withColumn(
        "burst_id",
        F.sum(F.when(F.col("gap_us") >= week_us, 1).otherwise(0)).over(w_run),
    )
    per_user = marked.groupBy("user_id").agg(
        F.floor(F.max("gap_us") / 86_400_000_000).cast("bigint").alias("max_gap_days"),
        F.max("burst_id").cast("bigint").alias("n_reactivations"),
        F.sum(
            F.when(
                F.col("burst_id") >= 1,
                F.floor(F.col("value") * 100 + 0.5).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        )
        .cast("bigint")
        .alias("post_gap_cents"),
    )
    return (
        per_user.where((F.col("n_reactivations") >= 1) & (F.col("post_gap_cents") > 0))
        .orderBy(F.desc("post_gap_cents"), "user_id")
        .limit(25)
    )
