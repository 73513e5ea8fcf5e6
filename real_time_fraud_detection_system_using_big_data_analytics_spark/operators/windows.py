"""Window functions: ranking, analytic (lag/lead), aggregate frames — and
the per-account velocity-feature templates the reference's fraud use case
needs but never implements (SURVEY §2.11, §2.6-T7).

Scale posture: a window shuffles once on partitionBy keys and sorts within
partitions. Per-user/account partitions are naturally small (bounded events
per user), so there is no skew hazard; global (un-partitioned) windows are
avoided everywhere — a global rank at 100 TB would funnel into one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import q
from ..plans.registry import register
from ..sources.tables import load_tables


@register(
    "window_topk_per_group",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS totalprice, rn
    FROM ranked WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the canonical top-k-per-group idiom
    (rank + filter, no self-join). Tie broken by orderkey: deterministic."""
    o = load_tables(spark, sf_dir, names=("orders",))["orders"]
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            # BIGINT on both sides — Spark ranks are int, DuckDB's bigint
            F.col("rn").cast("bigint").alias("rn"),
        )
    )


@register(
    "window_rank_dense_ntile",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4)     OVER w AS quartile,
           (FLOOR(PERCENT_RANK() OVER w * 10000.0 + 0.5) / 10000.0) AS pct_rank
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family over one shared window spec (single sort)."""
    c = load_tables(spark, sf_dir, names=("customer",))["customer"]
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        "c_mktsegment",
        # BIGINT on both sides — Spark ranks are int, DuckDB's bigint
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        q(F.percent_rank().over(w)).alias("pct_rank"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           ts,
           LAG(ts)  OVER w AS prev_ts,
           LEAD(ts) OVER w AS next_ts,
           ROUND(value - LAG(value) OVER w, 2) AS value_delta,
           COALESCE(epoch_us(ts) - epoch_us(LAG(ts) OVER w), 0) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead per user ordered by event time — inter-event gap
    is the building block for sessionization and velocity features.

    Gaps are computed in epoch MICROseconds (unix_micros/epoch_us):
    second-granularity unix_timestamp truncates each side before
    subtracting, which disagrees with interval arithmetic on sub-second
    timestamps."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
        F.lead("ts").over(w).alias("next_ts"),
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("value_delta"),
        F.coalesce(gap, F.lit(0)).cast("bigint").alias("gap_us"),
    )


@register(
    "window_running_agg",
    oracle="""
    SELECT user_id, event_id, ts,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS event_seq,
           (FLOOR(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 10000.0 + 0.5) / 10000.0) AS moving_avg_3
    FROM events
    """,
)
def window_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-frame running aggregates: cumulative total, sequence number,
    3-row moving average — per-account balance tracking as in the PaySim
    oldbalance/newbalance columns, derived instead of stored."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias(
            "running_total"
        ),
        F.count("*").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint").alias(
            "event_seq"
        ),
        # q(4): a 2-row frame averages odd cents to exact x.xx5 — a ROUND
        # tie; scale-4 floor-quantization is tie-free for n<=3 divisors
        q(F.avg("value").over(w.rowsBetween(-2, 0))).alias("moving_avg_3"),
    )


@register(
    "window_velocity_range_frame",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(COUNT(*) OVER w - 1 AS BIGINT)                    AS n_prior_1h,
           ROUND(SUM(value) OVER w - value, 2)                    AS sum_prior_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def window_velocity_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Velocity features via RANGE frame on epoch seconds: how many events /
    how much value did this user generate in the hour before each event.
    This is the batch formulation of the fraud-detection velocity feature
    the reference lacks (SURVEY §2.6-T7); the streaming formulation is in
    streaming/velocity.py.

    Note RANGE frames include peer rows (same timestamp), so 'prior' is
    computed by subtracting the current row from the inclusive frame —
    identical semantics in both engines even with duplicate timestamps.
    The frame key is epoch microseconds (not truncated seconds) so frame
    boundaries are exact for sub-second timestamps.
    """
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        (F.count("*").over(w) - 1).cast("bigint").alias("n_prior_1h"),
        F.round(F.sum("value").over(w) - F.col("value"), 2).alias("sum_prior_1h"),
    )


@register(
    "window_sessionize",
    oracle="""
    WITH gaps AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                       > 1800000000 OR
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           ROUND(SUM(value), 2) AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: gap>30min starts a new session (lag + cumsum
    idiom). One shuffle on user_id serves both windows and the final
    groupBy — Catalyst reuses the partitioning."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(gap_us.isNull() | (gap_us > 1800 * 1_000_000), 1).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        ev.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(cum).cast("bigint"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
    )


@register(
    "window_percent_cume",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           (FLOOR(PERCENT_RANK() OVER w * 10000.0 + 0.5) / 10000.0) AS pct_rank,
           (FLOOR(CUME_DIST() OVER w * 10000.0 + 0.5) / 10000.0) AS cume
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
    """,
)
def window_percent_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank and cume_dist per
    nation over supplier balance. The window order includes the unique
    s_suppkey tie-break so both engines see identical orderings (tied
    balances would otherwise give engine-dependent rank positions)."""
    s = load_tables(spark, sf_dir, names=("supplier",))["supplier"]
    from ..functions.scalars import q

    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return s.select(
        "s_suppkey",
        "s_nationkey",
        q(F.percent_rank().over(w)).alias("pct_rank"),
        q(F.cume_dist().over(w)).alias("cume"),
    )


@register(
    "window_first_last_nth",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice)  OVER w AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-navigation window functions: first/last/nth order price per
    customer over the full-partition frame. last_value/nth_value REQUIRE
    the explicit unbounded frame — the default frame stops at the current
    row, a classic cross-engine footgun both sides avoid identically.
    Unique o_orderkey tie-break keeps orderings identical."""
    o = load_tables(spark, sf_dir, names=("orders",))["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@register(
    "window_anomaly_zscore",
    oracle="""
    WITH rolled AS (
      SELECT event_id, user_id, ts, value,
             COUNT(value) OVER w AS n,
             SUM(value)   OVER w AS s1,
             SUM(value * value) OVER w AS s2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 19 PRECEDING AND 1 PRECEDING)
    ), scored AS (
      SELECT event_id, user_id, value,
             (FLOOR((value - s1 / n) / SQRT((s2 - s1 * s1 / n) / (n - 1))
                    * 10000.0 + 0.5) / 10000.0) AS z
      FROM rolled
      WHERE n >= 10 AND (s2 - s1 * s1 / n) / (n - 1) > 1e-9
    )
    SELECT event_id, user_id, ROUND(value, 2) AS amount, z
    FROM scored
    WHERE ABS(z) > 2.5
    ORDER BY ABS(z) DESC, event_id
    LIMIT 25
    """,
)
def window_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detector: each event scored against the
    trailing 19-event window of the SAME account (current row excluded, so
    an outlier never masks itself), flag |z| > 2.5 — the classic
    per-entity streaming anomaly rule, here in its batch-window form (the
    streaming twin is stream_velocity_stateful).

    Variance is derived from (n, Σx, Σx²) carried by ONE window pass
    rather than calling stddev directly: both engines then evaluate the
    identical closed-form expression on identically-ordered frame sums,
    and the z is quantized at 1e-4, so the comparison is exact. Frames
    with <10 observations or ~zero variance are excluded on both sides
    before the division. One shuffle on user_id; top-25 by |z| via
    TakeOrderedAndProject with event_id tie-break.
    """
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, -1)
    )
    rolled = ev.select(
        "event_id",
        "user_id",
        "value",
        F.count("value").over(w).alias("n"),
        F.sum("value").over(w).alias("s1"),
        F.sum(F.col("value") * F.col("value")).over(w).alias("s2"),
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    scored = rolled.where((F.col("n") >= 10) & (var > 1e-9)).select(
        "event_id",
        "user_id",
        "value",
        q((F.col("value") - F.col("s1") / F.col("n")) / F.sqrt(var)).alias("z"),
    )
    return (
        scored.where(F.abs("z") > 2.5)
        .select(
            "event_id", "user_id", F.round("value", 2).alias("amount"), "z"
        )
        .orderBy(F.abs("z").desc(), "event_id")
        .limit(25)
    )


@register(
    "window_cumulative_reset",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts, value,
             SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS segment_id
      FROM events
    ), running AS (
      SELECT user_id, event_id, segment_id,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                  OVER (PARTITION BY user_id, segment_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS running_cents
      FROM marked
    )
    SELECT user_id,
           CAST(MAX(segment_id) AS BIGINT) AS n_resets,
           MAX(running_cents) AS peak_running_cents
    FROM running
    GROUP BY user_id
    ORDER BY peak_running_cents DESC, user_id
    LIMIT 25
    """,
)
def window_cumulative_reset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total that RESETS at marker events (each 'signup' starts a
    new segment): cumulative spend since last reset, reported as per-user
    reset count and peak segment total — the odometer/counter-reset
    pattern (billing cycles, session spend, error budgets).

    Two stacked windows share ONE user_id partitioning: the prefix count
    of markers assigns segment ids, and the running sum within
    (user, segment) needs no extra shuffle because the finer key is a
    refinement of the partition already in place (Catalyst plans a
    single Exchange). Cents-integer money arithmetic end to end.
    """
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    w_seg = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = ev.withColumn(
        "segment_id",
        F.sum(F.when(F.col("event_type") == "signup", 1).otherwise(0)).over(w_seg),
    )
    w_run = (
        Window.partitionBy("user_id", "segment_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    running = marked.withColumn(
        "running_cents",
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint"))
        .over(w_run)
        .cast("bigint"),
    )
    return (
        running.groupBy("user_id")
        .agg(
            F.max("segment_id").cast("bigint").alias("n_resets"),
            F.max("running_cents").alias("peak_running_cents"),
        )
        .orderBy(F.desc("peak_running_cents"), "user_id")
        .limit(25)
    )


@register(
    "window_rolling_median",
    oracle="""
    WITH cents AS (
      SELECT user_id, event_id, ts,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ), rolled AS (
      SELECT user_id, event_id, cents,
             list(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
               AS lastk
      FROM cents
    )
    SELECT user_id, event_id,
           CAST(list_sort(lastk)[(len(lastk) + 1) // 2] AS BIGINT)
             AS rolling_median_cents,
           CAST(len(lastk) AS BIGINT) AS n_window
    FROM rolled
    WHERE len(lastk) = 10
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling MEDIAN over the trailing 10 events per account — the
    robust-statistics sibling of window_running_agg that no built-in
    window aggregate provides (median doesn't decompose into frames):
    the frame's values are collected in-frame, sorted in-row, and the
    lower-middle element picked — all JVM-side array expressions, exact
    because the money is integer cents (the "lower middle of sorted
    list" convention is pinned on both engines, sidestepping every
    interpolating-median dialect difference).

    One user_id shuffle; per-row state is the K-element frame array
    (bounded by the frame, not the partition). At larger K swap the
    in-row sort for the two-heap / order-statistic-tree mapInPandas
    kernel — the plan shape (one shuffle, partition-local order) stays
    identical. Emitted only for full frames so results are
    frame-size-deterministic.
    """
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    cents = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, 0)
    )
    rolled = cents.withColumn("lastk", F.collect_list("cents").over(w))
    return (
        rolled.where(F.size("lastk") == 10)
        .select(
            "user_id",
            "event_id",
            F.element_at(
                F.array_sort("lastk"),
                F.floor((F.size("lastk") + 1) / 2).cast("int"),
            )
            .cast("bigint")
            .alias("rolling_median_cents"),
            F.size("lastk").cast("bigint").alias("n_window"),
        )
    )


@register(
    "window_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d
      FROM events
    ), islands AS (
      SELECT user_id, d,
             d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
               AS island_id
      FROM days
    ), streaks AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS streak_days,
             CAST(MIN(d) AS INTEGER) AS start_d
      FROM islands GROUP BY user_id, island_id
    ), ranked AS (
      SELECT user_id, streak_days, start_d,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY streak_days DESC, start_d) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_streaks
      FROM streaks
    )
    SELECT user_id, streak_days AS max_streak_days, start_d AS streak_start_d,
           n_streaks
    FROM ranked WHERE rk = 1
    """,
)
def window_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per account (plus total
    streak count) — the gaps-and-islands classic: distinct active days,
    island id = day − row_number (constant within a consecutive run),
    one aggregate per island, top streak by (length, earliest start).
    Engagement metric on the analytics side; on the fraud side a
    too-perfect streak is scripted activity. Days are epoch-day integers
    (the dialect-free date arithmetic used across the repo). Two stacked
    windows + one aggregate, all sharing the single user_id Exchange."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    days = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("d"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn("island_id", F.col("d") - F.row_number().over(w))
    streaks = islands.groupBy("user_id", "island_id").agg(
        F.count("*").cast("bigint").alias("streak_days"),
        F.min("d").alias("start_d"),
    )
    wr = Window.partitionBy("user_id").orderBy(
        F.desc("streak_days"), "start_d"
    )
    ranked = streaks.select(
        "user_id",
        "streak_days",
        "start_d",
        F.row_number().over(wr).alias("rk"),
        F.count("*").over(Window.partitionBy("user_id")).cast("bigint").alias("n_streaks"),
    )
    return ranked.where(F.col("rk") == 1).select(
        "user_id",
        F.col("streak_days").alias("max_streak_days"),
        F.col("start_d").alias("streak_start_d"),
        "n_streaks",
    )


@register(
    "window_topk_with_ties",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
             RANK() OVER (PARTITION BY o_custkey
                          ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT)
                            DESC) AS rk
      FROM orders
    )
    SELECT o_custkey, o_orderkey, price_cents, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 2
    """,
)
def window_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k WITH TIES (SQL:2008 FETCH FIRST ... WITH TIES
    semantics): RANK() instead of ROW_NUMBER(), so equal-priced orders at
    the cut BOTH survive — the semantics difference that silently drops
    or keeps revenue depending on which the analyst meant
    (window_topk_per_group is the arbitrary-cut row_number twin). Prices
    compared as integer cents so tie groups are identical across engines
    — a float-compared RANK would make tie membership itself
    engine-dependent. Same single-shuffle WindowGroupLimit plan shape as
    the row_number form."""
    o = load_tables(spark, sf_dir, names=("orders",))["orders"]
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("price_cents"))
    return (
        o.select("o_custkey", "o_orderkey", cents.alias("price_cents"))
        .withColumn("rk", F.rank().over(w).cast("bigint"))
        .where(F.col("rk") <= 2)
    )


@register(
    "window_max_drawdown",
    oracle="""
    WITH flows AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'purchase'
                  THEN -CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                  ELSE CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) END
               AS delta_cents
      FROM events
    ), bal AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(delta_cents) OVER w AS BIGINT) AS balance
      FROM flows
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), peaks AS (
      SELECT user_id, balance,
             CAST(MAX(balance) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS BIGINT) AS peak
      FROM bal
    )
    SELECT user_id,
           CAST(MAX(peak - balance) AS BIGINT) AS max_drawdown_cents,
           CAST(MAX(peak) AS BIGINT) AS peak_balance_cents
    FROM peaks GROUP BY user_id
    """,
)
def window_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per account: the deepest peak-to-trough fall of
    the running balance (purchases debit, everything else credits) — the
    risk metric that catches an account being drained, and the exact
    MIRROR of fraud_cusum_drift's closed form (CUSUM tracks excursion
    above the running MIN; drawdown tracks fall below the running MAX —
    same two stacked window scans, same single user_id Exchange, same
    exact-BIGINT algebra). A third scan would be redundant: the final
    per-account MAX rides the same partitioning as the windows."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")
    flows = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", -cents)
        .otherwise(cents)
        .alias("delta_cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    bal = flows.select(
        "user_id",
        "ts",
        "event_id",
        F.sum("delta_cents").over(w).cast("bigint").alias("balance"),
    )
    peaks = bal.select(
        "user_id",
        "balance",
        F.max("balance").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ).cast("bigint").alias("peak"),
    )
    return peaks.groupBy("user_id").agg(
        F.max(F.col("peak") - F.col("balance"))
        .cast("bigint")
        .alias("max_drawdown_cents"),
        F.max("peak").cast("bigint").alias("peak_balance_cents"),
    )


@register(
    "window_hampel_filter",
    oracle="""
    WITH cents AS (
      SELECT user_id, ts, event_id,
             CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS x
      FROM events
    ), framed AS (
      SELECT user_id, event_id, x,
             list_sort(list(x) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
               AS arr
      FROM cents
    ), med AS (
      SELECT user_id, event_id, x, arr,
             arr[CAST(FLOOR((len(arr) + 1) / 2.0) AS INTEGER)] AS frame_med
      FROM framed
    ), mad AS (
      SELECT user_id, event_id, x, frame_med,
             list_sort(list_transform(arr, v -> ABS(v - frame_med)))
               [CAST(FLOOR((len(arr) + 1) / 2.0) AS INTEGER)] AS frame_mad
      FROM med
    )
    SELECT user_id, event_id, x AS cents, frame_med, frame_mad,
           ABS(x - frame_med) > 3 * frame_mad AS hampel_outlier
    FROM mad
    """,
)
def window_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel filter: per-account rolling ROBUST outlier detection — each
    transaction compared against the median and MAD of its centered
    7-transaction frame, flagged when it deviates more than 3 MADs. The
    moving-window version of fraud_mad_outliers, and the robust
    replacement for window_anomaly_zscore wherever the frame itself may
    contain the outliers (mean/std get dragged by the very spike being
    tested; median/MAD don't — the classic despiking filter).

    Both the median AND the MAD come from ONE collected frame array via
    higher-order functions (sort + element_at, transform for absolute
    deviations) — no second window pass, no UDF, all integer cents, the
    lower-median indexing discipline shared with rolling_median. One
    user_id shuffle; frame arrays are 7 elements regardless of scale."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 3)
    )
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")
    framed = ev.select(
        "user_id",
        "event_id",
        cents.alias("x"),
        F.sort_array(F.collect_list(cents).over(w)).alias("arr"),
    )
    mid = F.floor((F.size("arr") + 1) / 2.0).cast("int")
    med = framed.withColumn("frame_med", F.element_at("arr", mid))
    devs = F.sort_array(
        F.transform("arr", lambda v: F.abs(v - F.col("frame_med")))
    )
    mad = med.withColumn("frame_mad", F.element_at(devs, mid))
    return mad.select(
        "user_id",
        "event_id",
        F.col("x").alias("cents"),
        "frame_med",
        "frame_mad",
        (F.abs(F.col("x") - F.col("frame_med")) > 3 * F.col("frame_mad")).alias(
            "hampel_outlier"
        ),
    )
