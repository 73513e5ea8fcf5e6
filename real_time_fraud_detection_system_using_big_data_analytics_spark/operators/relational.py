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

from ..functions.scalars import q, rev_e4, rev_e4_sql
from ..plans.registry import register
from ..sources.tables import load_tables


# --------------------------------------------------------------------------
# Flagship: TPC-H-Q1-shaped pricing summary (scan → filter → groupBy → agg →
# derived columns → sort). Exercises A1/A2/A5 + P1/P6 shapes in one plan.
# --------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_linestatus, l_quantity,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents,
             CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)      AS disc_pct,
             CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT)           AS tax_pct
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    )
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(l_quantity) AS DOUBLE)                                     AS sum_qty,
      CAST(SUM(price_cents) AS DOUBLE) / 100.0                            AS sum_base_price,
      CAST(SUM(price_cents * (100 - disc_pct)) AS DOUBLE) / 10000.0       AS sum_disc_price,
      CAST(SUM(price_cents * (100 - disc_pct) * (100 + tax_pct)) AS DOUBLE)
        / 1000000.0                                                       AS sum_charge,
      FLOOR(SUM(l_quantity) * 100.0 / COUNT(*) + 0.5) / 100.0             AS avg_qty,
      FLOOR(CAST(SUM(price_cents) AS DOUBLE) / COUNT(*) + 0.5) / 100.0    AS avg_price,
      FLOOR(CAST(SUM(disc_pct) AS DOUBLE) / COUNT(*) + 0.5) / 100.0       AS avg_disc,
      COUNT(*)                                                            AS count_order
    FROM c
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 in EXACT integer units: price/discount/tax quantized per
    row to cents / integer percent, so every money sum is an order-free
    BIGINT (disc price in 1e-4 units, charge in 1e-6) and each output is
    one deterministic division of exact integers. Round 6 hardening: the
    original ROUND(SUM(4-to-6-decimal products), 2) form is a knife edge
    — a sum landing exactly on a half-cent makes Spark (rounds on
    Double.toString) and DuckDB (rounds the raw double) disagree
    DETERMINISTICALLY, with ~1%-per-group odds for 4-decimal data; the
    r6 sf0.1 oracle run caught this class on agg_grouped_summary and the
    whole revenue family was converted. Overflow horizon: charge units
    are ~1e11 per row, so a single group overflows BIGINT near 1e7 rows
    x 1e11 = 1e18 — at that scale widen to DECIMAL(38,0) partials; the
    plan shape is unchanged."""
    li = load_tables(spark, sf_dir, names=("lineitem",))["lineitem"]
    price_cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    disc_pct = F.floor(F.col("l_discount") * 100 + 0.5).cast("long")
    tax_pct = F.floor(F.col("l_tax") * 100 + 0.5).cast("long")
    c = li.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    ).select(
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        price_cents.alias("price_cents"),
        disc_pct.alias("disc_pct"),
        tax_pct.alias("tax_pct"),
    )
    n = F.count("*")
    return (
        c.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            (F.sum("price_cents").cast("double") / 100.0).alias("sum_base_price"),
            (
                F.sum(F.col("price_cents") * (100 - F.col("disc_pct"))).cast("double")
                / 10000.0
            ).alias("sum_disc_price"),
            (
                F.sum(
                    F.col("price_cents")
                    * (100 - F.col("disc_pct"))
                    * (100 + F.col("tax_pct"))
                ).cast("double")
                / 1000000.0
            ).alias("sum_charge"),
            (F.floor(F.sum("l_quantity") * 100.0 / n + 0.5) / 100.0).alias("avg_qty"),
            (F.floor(F.sum("price_cents").cast("double") / n + 0.5) / 100.0).alias(
                "avg_price"
            ),
            (F.floor(F.sum("disc_pct").cast("double") / n + 0.5) / 100.0).alias(
                "avg_disc"
            ),
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
    """P1: equality filter + projection (reference filter pattern,
    fraud_detection_model.py:80). The predicate and the 4-column
    projection both reach the parquet scan (PushedFilters/ReadSchema
    pinned in tests/test_plans.py) — zero shuffle, embarrassingly
    parallel at any scale."""
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
    """P3: compound AND/OR predicate in one filter (the reference runs
    four separate filter+count jobs for its confusion matrix,
    fraud_detection_model.py:259-271; the engine expresses compound
    logic in a single pushed-down scan predicate). Scan-only plan —
    no shuffle."""
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
    """P4/P6/P7: projection with computed, cast and renamed columns
    (reference: prediction.cast("int"), probability[1] alias —
    fraud_detection_model.py:395-399; classWeight arithmetic —
    :206-209). All expressions are JVM whole-stage-codegen; the scan
    reads only the three source columns. q() floor-quantizes the tax
    column because price*0.1 lands on decimal ties where Spark and
    DuckDB ROUND disagree."""
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
      FLOOR(CAST(SUM(CASE WHEN event_type = 'purchase'
                          THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END) AS DOUBLE)
            / COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) + 0.5) / 100.0
                                                                      AS avg_purchase_value,
      ROUND(MIN(value), 2)                                            AS min_value,
      ROUND(MAX(value), 2)                                            AS max_value
    FROM events
    """,
)
def agg_conditional_single_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused conditional counts + conditional mean in ONE pass (reference
    runs 4 jobs for 4 counts). The conditional mean is integer-cents
    exact (per-row quantize, one deterministic division) — the r6 knife-
    edge hardening; min/max stay ROUND (one untouched per-row double,
    order-free, never on a boundary its own datum isn't)."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    purchase_cents = F.when(
        F.col("event_type") == "purchase",
        F.floor(F.col("value") * 100 + 0.5).cast("long"),
    )
    return ev.agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("value") > 100, 1).otherwise(0)).alias("n_high"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_error"),
        (
            F.floor(
                F.sum(purchase_cents).cast("double") / F.count(purchase_cents) + 0.5
            )
            / 100.0
        ).alias("avg_purchase_value"),
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
    WITH c AS (
      SELECT event_type, user_id,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    )
    SELECT
      event_type,
      COUNT(*)                                   AS n,
      CAST(SUM(cents) AS BIGINT)                 AS total_cents,
      CAST(FLOOR(CAST(SUM(cents) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT)
                                                 AS avg_cents,
      CAST(MIN(cents) AS BIGINT)                 AS min_cents,
      CAST(MAX(cents) AS BIGINT)                 AS max_cents,
      COUNT(DISTINCT user_id)                    AS n_users,
      CAST(FLOOR(CAST(SUM(cents) AS DOUBLE) / COUNT(DISTINCT user_id) + 0.5)
           AS BIGINT)                            AS cents_per_user
    FROM c
    GROUP BY event_type
    """,
)
def agg_grouped_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped min/max/avg/sum summary (reference A4) in INTEGER CENTS:
    every money figure is quantized per row before aggregation, so sums
    are order-free BIGINTs and the derived means are one exact-int
    division + half-up floor. Round 6 rewrite: the original ROUND(SUM/
    AVG(double), 2) form passed five rounds at sf0.01 and then hash-
    mismatched at sf0.1 on a half-cent boundary (998497.5 summed in
    different orders; Spark's round goes through Double.toString while
    DuckDB rounds the raw double — the two disagree exactly ON the .005
    knife edge). The 10x oracle run exists to catch precisely this class;
    same cents discipline as every other money operator in the repo."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    c = ev.select("event_type", "user_id", cents.alias("cents"))
    return c.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.floor(F.sum("cents").cast("double") / F.count("*") + 0.5)
        .cast("long")
        .alias("avg_cents"),
        F.min("cents").cast("long").alias("min_cents"),
        F.max("cents").cast("long").alias("max_cents"),
        F.countDistinct("user_id").alias("n_users"),
        F.floor(F.sum("cents").cast("double") / F.countDistinct("user_id") + 0.5)
        .cast("long")
        .alias("cents_per_user"),
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
    """§2.7 scalar-function showcase: string (upper/substring/length),
    date (date_trunc/hour) and JSON-field extraction in one projection —
    the scalar surface the reference touches via from_json + cast
    (spark_streaming_app.py:419-421). All built-in JVM expressions in a
    single codegen stage over a pruned 4-column scan."""
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
           CAST(SUM({REV_E4}) AS DOUBLE) / 10000.0 AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY SUM({REV_E4}) DESC, o.o_orderkey
    LIMIT 10
    """.format(REV_E4=rev_e4_sql("l.l_extendedprice", "l.l_discount")),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): unshipped high-revenue orders of
    one market segment. Both date filters push to the parquet scans; the
    customer-segment filter prunes the broadcast side BEFORE the fact join;
    top-10 compiles to TakeOrderedAndProject ordered by the EXACT BIGINT
    revenue (1e-4 units — r6 knife-edge hardening, see q1) with the order
    key breaking ties, so the cut order can never drift between engines."""
    t = load_tables(spark, sf_dir, names=("customer", "orders", "lineitem"))
    cutoff = F.lit("1998-06-01").cast("timestamp_ntz")
    rev = F.sum(rev_e4())
    return (
        t["lineitem"].filter(F.col("l_shipdate") > cutoff)
        .join(t["orders"].filter(F.col("o_orderdate") < cutoff),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"].filter(F.col("c_mktsegment") == "BUILDING")),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev.alias("_rev_e4"))
        .orderBy(F.desc("_rev_e4"), "o_orderkey")
        .limit(10)
        .select("o_orderkey",
                (F.col("_rev_e4").cast("double") / 10000.0).alias("revenue"),
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
