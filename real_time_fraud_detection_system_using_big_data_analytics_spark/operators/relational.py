"""Core relational operators: scans, projections, filters, aggregations.

Reference parity (SURVEY §2.2-§2.3): the reference's dataflow is
scan → filter(equality / compound boolean) → derived columns → counts
(fraud_detection_model.py:76-80,197-209,256-271). Each shape is generalized
here as an oracle-checked query over the driver's synthetic tables.

Scale notes: every query is a single lazy plan — filters sit directly on the
parquet scan (pushdown), aggregations are partial (map-side combine) before
the shuffle, and multi-metric summaries are one pass (``agg`` of many
expressions) instead of the reference's one-job-per-count pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import q
from ..plans.registry import register
from ..sources.tables import load_tables


# --------------------------------------------------------------------------
# Flagship: TPC-H-Q1-shaped pricing summary (scan → filter → groupBy → agg →
# derived columns → sort). Exercises A1/A2/A5 + P1/P6 shapes in one plan.
# --------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      ROUND(SUM(l_quantity), 2)                                           AS sum_qty,
      ROUND(SUM(l_extendedprice), 2)                                      AS sum_base_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                   AS sum_disc_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)     AS sum_charge,
      ROUND(AVG(l_quantity), 2)                                           AS avg_qty,
      ROUND(AVG(l_extendedprice), 2)                                      AS avg_price,
      ROUND(AVG(l_discount), 2)                                           AS avg_disc,
      COUNT(*)                                                            AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, names=("lineitem",))["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 2).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# P1/P2: equality filters (reference: df.filter(col("isFraud")==1),
# fraud_detection_model.py:80). Projection with pushdown-able predicate.
# --------------------------------------------------------------------------

@register(
    "filter_equality",
    oracle="""
    SELECT event_id, user_id, event_type, ROUND(value, 2) AS value
    FROM events
    WHERE event_type = 'error'
    """,
)
def filter_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    return (
        ev.filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "event_type", F.round("value", 2).alias("value"))
    )


# --------------------------------------------------------------------------
# P3: compound boolean predicate (reference confusion-matrix filters,
# fraud_detection_model.py:259-271) — conjunction/disjunction of comparisons.
# --------------------------------------------------------------------------

@register(
    "filter_compound_predicate",
    oracle="""
    SELECT event_id, user_id, event_type, ROUND(value, 2) AS value
    FROM events
    WHERE (event_type = 'purchase' AND value > 150.0)
       OR (event_type = 'error' AND value < 50.0)
    """,
)
def filter_compound_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    pred = ((F.col("event_type") == "purchase") & (F.col("value") > 150.0)) | (
        (F.col("event_type") == "error") & (F.col("value") < 50.0)
    )
    return ev.filter(pred).select(
        "event_id", "user_id", "event_type", F.round("value", 2).alias("value")
    )


# --------------------------------------------------------------------------
# P4/P6/P7: projection with computed, cast and renamed columns (reference:
# prediction.cast("int"), probability[1] alias — fraud_detection_model.py:395-399;
# classWeight arithmetic — :206-209).
# --------------------------------------------------------------------------

@register(
    "project_computed_columns",
    oracle="""
    SELECT
      o_orderkey,
      CAST(FLOOR(o_totalprice) AS BIGINT)                  AS price_int,
      (FLOOR(o_totalprice * 0.1 * 100.0 + 0.5) / 100.0)    AS tax_amount,
      UPPER(o_orderstatus)                                 AS status_uc,
      CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END    AS is_big
    FROM orders
    """,
)
def project_computed_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    return orders.select(
        "o_orderkey",
        # explicit floor: DuckDB CAST(double AS BIGINT) rounds, Spark truncates
        F.floor("o_totalprice").cast("bigint").alias("price_int"),
        # q(): price*0.1 lands on decimal ties (…2529.05*0.1 = …52.905)
        # where Spark/DuckDB ROUND disagree; floor-quantize instead
        q(F.col("o_totalprice") * 0.1, 2).alias("tax_amount"),
        F.upper("o_orderstatus").alias("status_uc"),
        F.when(F.col("o_totalprice") > 200000, 1).otherwise(0).alias("is_big"),
    )


# --------------------------------------------------------------------------
# A1/A2 fused: global count + conditional counts in ONE pass — the engine's
# replacement for the reference's 4-jobs-for-4-counts confusion pattern
# (fraud_detection_model.py:256-271). Map-side partial agg, single shuffle.
# --------------------------------------------------------------------------

@register(
    "agg_conditional_single_pass",
    oracle="""
    SELECT
      COUNT(*)                                                        AS total,
      CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT)    AS n_high,
      CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
      ROUND(AVG(CASE WHEN event_type = 'purchase' THEN value END), 2) AS avg_purchase_value,
      ROUND(MIN(value), 2)                                            AS min_value,
      ROUND(MAX(value), 2)                                            AS max_value
    FROM events
    """,
)
def agg_conditional_single_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    return ev.agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("value") > 100, 1).otherwise(0)).alias("n_high"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_error"),
        F.round(F.avg(F.when(F.col("event_type") == "purchase", F.col("value"))), 2).alias(
            "avg_purchase_value"
        ),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
    )


# --------------------------------------------------------------------------
# A4/A5: grouped summary with derived ratio columns (reference computes these
# driver-side over collected counts — spark_streaming_app.py:211-213; here it
# is one distributed pass + post-agg arithmetic).
# --------------------------------------------------------------------------

@register(
    "agg_grouped_summary",
    oracle="""
    SELECT
      event_type,
      COUNT(*)                                   AS n,
      ROUND(SUM(value), 2)                       AS total_value,
      ROUND(AVG(value), 2)                       AS avg_value,
      ROUND(MIN(value), 2)                       AS min_value,
      ROUND(MAX(value), 2)                       AS max_value,
      COUNT(DISTINCT user_id)                    AS n_users,
      ROUND(SUM(value) / COUNT(DISTINCT user_id), 2) AS value_per_user
    FROM events
    GROUP BY event_type
    """,
)
def agg_grouped_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.round(F.avg("value"), 2).alias("avg_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value") / F.countDistinct("user_id"), 2).alias("value_per_user"),
    )


# --------------------------------------------------------------------------
# Scalar function surface: string/date/json extraction (SURVEY §2.7 — the
# reference's only JSON op is from_json at spark_streaming_app.py:420; the
# events.props column generalizes it to JSON field extraction).
# --------------------------------------------------------------------------

@register(
    "scalar_string_date_json",
    oracle="""
    SELECT
      event_id,
      UPPER(event_type)                                    AS type_uc,
      SUBSTR(event_type, 1, 2)                             AS type_prefix,
      CAST(LENGTH(event_type) AS INTEGER)                  AS type_len,
      CAST(date_trunc('day', ts) AS TIMESTAMP)             AS day,
      CAST(EXTRACT(hour FROM ts) AS INTEGER)               AS hour_of_day,
      CAST(json_extract_string(props, '$.k') AS INTEGER)   AS prop_k
    FROM events
    """,
)
def scalar_string_date_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    return ev.select(
        "event_id",
        F.upper("event_type").alias("type_uc"),
        F.substring("event_type", 1, 2).alias("type_prefix"),
        F.length("event_type").alias("type_len"),
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.hour("ts").cast("int").alias("hour_of_day"),
        # NOTE: regexp_extract, not get_json_object/from_json — the Jackson
        # path is erratically 10-100x slower in this sandbox; for a flat
        # single-key object the anchored regex is semantically identical.
        F.regexp_extract("props", r'"k":\s*(-?\d+)', 1).cast("int").alias("prop_k"),
    )


@register(
    "dq_audit_rules",
    oracle="""
    SELECT 'lineitem_null_keys' AS rule,
           CAST(SUM(CASE WHEN l_orderkey IS NULL OR l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_nonpositive_qty',
           CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_discount_range',
           CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'orphan_lineitems',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    """,
)
def dq_audit_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: null-key, range, and referential-integrity
    checks as one report. The three column rules fuse into a single
    conditional aggregate over one scan; the FK check is a left-anti join
    (never a per-row subquery). The stable (rule, violations) shape is
    what a pipeline gate consumes — every rule must read 0 on the
    synthetic tables, which the oracle confirms rather than assumes."""
    t = load_tables(spark, sf_dir, names=("lineitem", "orders"))
    li, o = t["lineitem"], t["orders"]
    cols = li.agg(
        F.sum(
            (F.col("l_orderkey").isNull() | F.col("l_partkey").isNull()).cast("long")
        ).alias("lineitem_null_keys"),
        F.sum((F.col("l_quantity") <= 0).cast("long")).alias("lineitem_nonpositive_qty"),
        F.sum(((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).cast("long")).alias(
            "lineitem_discount_range"
        ),
    )
    orphans = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(F.count("*").alias("orphan_lineitems"))
    )
    wide = cols.crossJoin(orphans)
    return wide.select(
        F.expr(
            "stack(4, 'lineitem_null_keys', lineitem_null_keys,"
            " 'lineitem_nonpositive_qty', lineitem_nonpositive_qty,"
            " 'lineitem_discount_range', lineitem_discount_range,"
            " 'orphan_lineitems', orphan_lineitems) AS (rule, violations)"
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT o.o_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY SUM(l.l_extendedprice * (1 - l.l_discount)) DESC, o.o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): unshipped high-revenue orders of
    one market segment. Both date filters push to the parquet scans; the
    customer-segment filter prunes the broadcast side BEFORE the fact join;
    top-10 compiles to TakeOrderedAndProject ordered by the UNROUNDED
    revenue with the order key breaking float ties."""
    t = load_tables(spark, sf_dir, names=("customer", "orders", "lineitem"))
    cutoff = F.lit("1998-06-01").cast("timestamp_ntz")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        t["lineitem"].filter(F.col("l_shipdate") > cutoff)
        .join(t["orders"].filter(F.col("o_orderdate") < cutoff),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"].filter(F.col("c_mktsegment") == "BUILDING")),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev.alias("_rev"))
        .orderBy(F.desc("_rev"), "o_orderkey")
        .limit(10)
        .select("o_orderkey", F.round("_rev", 2).alias("revenue"),
                "o_orderdate", "o_orderpriority")
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           ROUND(o.o_totalprice, 2) AS totalprice,
           CAST(SUM(l.l_quantity) AS BIGINT) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 250
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose total
    quantity tops 250, with their customer. The IN-subquery decorrelates
    to a left-semi join against a pre-aggregated lineitem (the HAVING
    runs BEFORE the 3-way join, so the expensive joins see only
    qualifying orders). Quantities are integer-valued doubles — the sum
    is exact in IEEE, so BIGINT on both sides is deterministic."""
    t = load_tables(spark, sf_dir, names=("customer", "orders", "lineitem"))
    big = (
        t["lineitem"].groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 250)
        .select("l_orderkey")
    )
    return (
        t["orders"].join(big.withColumnRenamed("l_orderkey", "o_orderkey"),
                         "o_orderkey", "left_semi")
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("bigint").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                F.round("o_totalprice", 2).alias("totalprice"), "total_qty")
    )
