"""Training-feature engineering operators: stratified sampling, per-group
standardization, percentile winsorization, SCD2 validity intervals.

The reference's only feature transforms are its five MLlib stages
(fraud_detection_model.py:110-169) and the classWeight arithmetic column
(fraud_detection_model.py:206-209); everything here is the wider feature-
engineering surface a training-data pipeline needs (SURVEY §2.11 north
star). All four operators are pure built-in-function plans — no UDFs — so
they stay inside whole-stage codegen and are DuckDB-oracle-checkable.

Scale posture:
- stratified sampling is a stateless per-row hash test: no shuffle at all,
  embarrassingly parallel, stable across reruns/engines (same md5 trick as
  ``split_by_hash``);
- z-score uses one shuffle on the group key; group cardinality is tiny
  (event types), so AQE coalesces the post-shuffle partitions;
- winsorize computes per-group exact percentiles in one aggregate over the
  same shuffle, then broadcasts the tiny bounds table back onto the fact
  side — the fact table is never shuffled twice;
- SCD2 intervals shuffle once on the entity key; at 100 TB the entity key
  is the natural partition key so the sort inside each partition is local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_tables


@register(
    "sample_stratified_hash",
    oracle="""
    WITH tagged AS (
      SELECT event_type,
             md5(CAST(event_id AS VARCHAR)) AS h
      FROM events
    )
    SELECT event_type, COUNT(*) AS n_sampled
    FROM tagged
    WHERE h < CASE WHEN event_type = 'purchase'
                   THEN 'ffffffffffffffffffffffffffffffff'
                   ELSE '33333333333333333333333333333333' END
    GROUP BY event_type
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep ALL rows of the rare class
    (purchase — the analogue of isFraud=1, ~class imbalance the reference
    fights with classWeight at fraud_detection_model.py:197-209) and a
    fixed ~20% hash slice of everything else. Unlike ``sampleBy`` this is
    RNG-free: membership depends only on the row key, so the sample is
    reproducible across engines and joinable against itself at any later
    pipeline stage. No shuffle until the final tiny count."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    h = F.md5(F.col("event_id").cast("string"))
    keep = F.when(
        F.col("event_type") == "purchase",
        F.lit("ffffffffffffffffffffffffffffffff"),
    ).otherwise(F.lit("33333333333333333333333333333333"))
    return (
        ev.filter(h < keep)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_sampled"))
    )


@register(
    "feature_zscore_by_group",
    oracle="""
    WITH stats AS (
      SELECT event_id, value, event_type,
             AVG(value)         OVER (PARTITION BY event_type) AS mu,
             STDDEV_SAMP(value) OVER (PARTITION BY event_type) AS sigma
      FROM events
    )
    SELECT event_id, event_type,
           ROUND((value - mu) / sigma, 4) AS zscore
    FROM stats
    ORDER BY event_id LIMIT 500
    """,
)
def feature_zscore_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group standardization of a numeric feature — the distributed
    equivalent of the reference's StandardScaler stage
    (fraud_detection_model.py:151-157), but grouped: each event_type gets
    its own mu/sigma. Expressed as unbounded window aggregates so the fact
    table is shuffled ONCE on the group key and both moments come out of
    the same sort."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    w = Window.partitionBy("event_type")
    z = (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w)
    return (
        ev.select(
            "event_id",
            "event_type",
            F.round(z, 4).alias("zscore"),
        )
        .orderBy("event_id")
        .limit(500)
    )


@register(
    "feature_winsorize",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    bounds AS (
      SELECT event_type,
             MIN(CASE WHEN rn = ((n - 1) * 5) // 100 + 1 THEN value END) AS lo,
             MIN(CASE WHEN rn = ((n - 1) * 95) // 100 + 1 THEN value END) AS hi
      FROM ranked GROUP BY event_type
    )
    SELECT e.event_type,
           FLOOR(CAST(SUM(CAST(FLOOR((CASE WHEN e.value < b.lo THEN b.lo
                          WHEN e.value > b.hi THEN b.hi
                          ELSE e.value END) * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
                 / COUNT(*) + 0.5) / 10000.0 AS avg_clipped,
           CAST(SUM(CASE WHEN e.value < b.lo OR e.value > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
    FROM events e JOIN bounds b USING (event_type)
    GROUP BY e.event_type
    """,
)
def feature_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile winsorization (outlier clipping) — standard before
    feeding heavy-tailed amounts into a linear model like the reference's
    LogisticRegression (fraud_detection_model.py:160-169). Bounds are
    NEAREST-RANK order statistics — lo = value at 1-based rank
    ((n-1)*5) div 100 + 1, hi at ((n-1)*95) div 100 + 1, pure integer
    rank arithmetic and ACTUAL stored values, never an interpolated
    double (r11: interpolated percentile_cont/percentile differed in the
    last ulp between engines at the true-sf1 gate, flipping 50 tied rows
    across the clip boundary; an order statistic cannot diverge at any
    margin). The bounds table (one row per event type) broadcasts back
    onto the fact scan; at 100 TB the bound pass is the same per-group
    sort any exact-percentile winsorize pays (approx quantiles are the
    documented relaxation)."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    wr = Window.partitionBy("event_type").orderBy("value")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    bounds = ranked.groupBy("event_type").agg(
        F.min(
            F.when(F.col("rn") == F.expr("((n - 1) * 5) div 100 + 1"), F.col("value"))
        ).alias("lo"),
        F.min(
            F.when(F.col("rn") == F.expr("((n - 1) * 95) div 100 + 1"), F.col("value"))
        ).alias("hi"),
    )
    clipped = F.when(F.col("value") < F.col("lo"), F.col("lo")).when(
        F.col("value") > F.col("hi"), F.col("hi")
    ).otherwise(F.col("value"))
    out_of_range = (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            (
                F.floor(
                    F.sum(F.floor(clipped * 10000 + 0.5).cast("long")).cast("double")
                    / F.count("*")
                    + 0.5
                )
                / 10000.0
            ).alias("avg_clipped"),
            F.sum(out_of_range.cast("bigint")).alias("n_clipped"),
        )
    )


@register(
    "scd2_intervals",
    oracle="""
    WITH versions AS (
      SELECT user_id, event_type, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      FROM events
    )
    SELECT user_id, event_type, valid_from, valid_to,
           CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current
    FROM versions
    WHERE user_id < 50
    """,
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 reconstruction: turn an append-only
    event log into validity intervals [valid_from, valid_to) per entity,
    open-ended for the current version. This is the warehouse-side inverse
    of the reference's append-only transactions table (to_sql.py:40-62) —
    it recovers point-in-time state from the log. One shuffle on the entity
    key; LEAD comes out of the same per-partition sort. Filtered to a
    stable entity slice so the oracle result is small."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.filter(F.col("user_id") < 50)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
        .withColumn(
            "is_current",
            F.when(F.col("valid_to").isNull(), 1).otherwise(0),
        )
    )


@register(
    "scd2_point_in_time",
    oracle="""
    WITH dim AS (
      SELECT user_id, event_type AS prior_type, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM events
    ), facts AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT COALESCE(d.prior_type, 'none') AS prior_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(f.value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_value_cents
    FROM facts f LEFT JOIN dim d
      ON d.user_id = f.user_id
     AND d.valid_from < f.ts
     AND d.valid_to IS NOT NULL AND f.ts <= d.valid_to
    GROUP BY 1
    """,
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lookup half of SCD2 — the query scd2_intervals exists to serve:
    join each fact (purchase) to the dimension version that was valid AT
    the fact's timestamp, i.e. "what state was this account in when it
    bought". Prior-state semantics: the version interval must START
    strictly before the fact (valid_from < ts <= valid_to), so a purchase
    never matches the version it itself opens; a user's first-ever event
    reports prior state 'none' via the left join. Output is the compact
    prior-state transition summary, with value totals in BIGINT cents
    (exact, order-independent, engine-version-proof).

    Scale shape: the equi key (user_id) carries the shuffle — both sides
    co-partition on it, the interval predicate is a post-join filter
    inside the same sort-merge join (join_range's shape, pointed at a
    versioned dimension); at warehouse scale the dimension is additionally
    bucketed on the key, making the PIT lookup shuffle-free."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = ev.select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("prior_type"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = facts.join(
        dim,
        (F.col("d_user") == F.col("user_id"))
        & (F.col("valid_from") < F.col("ts"))
        & F.col("valid_to").isNotNull()
        & (F.col("ts") <= F.col("valid_to")),
        "left",
    )
    return joined.groupBy(
        F.coalesce(F.col("prior_type"), F.lit("none")).alias("prior_type")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("total_value_cents"),
    )


@register(
    "scd2_apply_changes",
    oracle="""
    WITH dim AS (
      SELECT c_custkey, c_mktsegment AS segment,
             TIMESTAMP '2020-01-01' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to
      FROM customer
    ),
    changes AS (
      SELECT c_custkey, 'MIGRATED' AS new_segment,
             TIMESTAMP '2021-06-01' AS effective
      FROM customer WHERE c_custkey % 10 = 0
    ),
    closed AS (
      SELECT d.c_custkey, d.segment, d.valid_from,
             CASE WHEN ch.c_custkey IS NOT NULL THEN ch.effective
                  ELSE d.valid_to END AS valid_to
      FROM dim d LEFT JOIN changes ch ON ch.c_custkey = d.c_custkey
    ),
    inserted AS (
      SELECT c_custkey, new_segment AS segment, effective AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to
      FROM changes
    ),
    applied AS (
      SELECT * FROM closed UNION ALL SELECT * FROM inserted
    )
    SELECT c_custkey, segment, valid_from, valid_to,
           CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current
    FROM applied WHERE c_custkey < 200
    """,
)
def scd2_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WRITE half of SCD2 — applying a change batch to a type-2
    dimension: every changed key's current row is CLOSED (valid_to set to
    the change's effective time) and a new open-ended version is
    INSERTED; unchanged keys pass through untouched. scd2_intervals
    reconstructs history from a log, scd2_point_in_time reads it — this
    is the maintenance operation that keeps it true as changes arrive.

    Plan: one left join of the dimension against the (small) change batch
    to close rows — AQE broadcasts the changes while they fit — plus a
    union of the new versions; no window, no full-table rewrite logic
    beyond the join. At 100 TB this composes with dynamic partition
    overwrite (etl_backfill_dynamic_overwrite) so only partitions holding
    changed keys rewrite."""
    t = load_tables(spark, sf_dir, names=("customer",))
    ts2020 = F.lit("2020-01-01").cast("timestamp_ntz")
    ts_eff = F.lit("2021-06-01").cast("timestamp_ntz")
    null_ts = F.lit(None).cast("timestamp")
    dim = t["customer"].select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        ts2020.alias("valid_from"),
        null_ts.alias("valid_to"),
    )
    changes = (
        t["customer"]
        .filter(F.col("c_custkey") % 10 == 0)
        .select(
            F.col("c_custkey").alias("ch_key"),
            F.lit("MIGRATED").alias("new_segment"),
            ts_eff.alias("effective"),
        )
    )
    closed = dim.join(changes, dim.c_custkey == changes.ch_key, "left").select(
        "c_custkey",
        "segment",
        "valid_from",
        F.when(F.col("ch_key").isNotNull(), F.col("effective"))
        .otherwise(F.col("valid_to"))
        .alias("valid_to"),
    )
    inserted = changes.select(
        F.col("ch_key").alias("c_custkey"),
        F.col("new_segment").alias("segment"),
        F.col("effective").alias("valid_from"),
        null_ts.alias("valid_to"),
    )
    return (
        closed.unionByName(inserted)
        .filter(F.col("c_custkey") < 200)
        .withColumn(
            "is_current", F.when(F.col("valid_to").isNull(), 1).otherwise(0)
        )
    )
