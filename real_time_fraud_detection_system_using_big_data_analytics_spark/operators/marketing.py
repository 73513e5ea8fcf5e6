"""Customer-behavior analytics: RFM segmentation, last-touch attribution,
association rules with confidence/lift, and a GDPR-style delete cascade.

The reference aggregates per-customer behavior only implicitly (the
nameOrig/nameDest counterparty rollups in spark_streaming_app.py:33-45 and
the per-type fraud rates in fraud_detection_model.py:104-118); these are
the standard marketing/compliance queries a production deployment of that
system runs next, expressed as single declarative Catalyst plans.

Scale posture:
- RFM shuffles the orders fact ONCE on o_custkey for the per-customer
  rollup; the NTILE ranking then runs over the *customer-cardinality*
  rollup, partitioned into quartiles by a global sort of three scalars per
  customer — at 10^9 customers swap NTILE for approx percentile cutoffs
  (computed once, broadcast) so no single-partition window is needed. The
  final segment count aggregate is map-side combinable.
- Attribution is the funnel_conversion shape: ONE shuffle on user_id, a
  running "last non-purchase touch" carried as a packed BIGINT under a
  prefix MAX window (no self-join of events to events, which the naive
  point-in-time formulation would cost).
- Association rules reuse the in-row pair expansion of market_basket_pairs
  (graph.py:211) — no lineitem self-join; item supports come from ONE
  aggregate over exploded baskets, joined back onto the pair counts (both
  sides are item-cardinality, far below the fact table).
- The GDPR cascade is two anti-joins chained on the natural keys; the
  tombstone side is tiny by construction (regulator requests), so AQE
  picks broadcast for both — the fact table is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import q, q_sql
from ..plans.registry import register
from ..sources.tables import load_tables

_ANCHOR = "TIMESTAMP '1998-08-01 00:00:00'"


@register(
    "rfm_segmentation",
    oracle=f"""
    WITH rfm AS (
      SELECT o_custkey,
             DATE_DIFF('day', MAX(o_orderdate), {_ANCHOR}) AS recency_days,
             COUNT(*) AS frequency,
             SUM(o_totalprice) AS monetary
      FROM orders
      GROUP BY o_custkey
    ), scored AS (
      SELECT o_custkey,
             NTILE(4) OVER (ORDER BY recency_days ASC,  o_custkey) AS r_score,
             NTILE(4) OVER (ORDER BY frequency DESC,    o_custkey) AS f_score,
             NTILE(4) OVER (ORDER BY monetary DESC,     o_custkey) AS m_score,
             monetary
      FROM rfm
    )
    SELECT CAST(r_score AS INT) AS r_score,
           CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           COUNT(*) AS n_customers,
           {q_sql('SUM(monetary)', 2)} AS total_monetary
    FROM scored
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency/Frequency/Monetary quartile segmentation of the customer
    base — the canonical CRM rollup (recency measured back from a fixed
    anchor date so the query is deterministic).

    NTILE ties are broken by o_custkey on both engines, so quartile
    membership is identical bucket-for-bucket. The NTILE windows are
    unpartitioned (a global sort of the per-customer rollup): fine at
    customer cardinality here and honest about the scale seam — the
    100 TB variant computes 3×3 approx-percentile cutpoints in one pass
    and joins them broadcast instead (see feature_winsorize for that
    pattern in this repo).
    """
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    anchor = F.to_timestamp(F.lit("1998-08-01 00:00:00"))
    rfm = orders.groupBy("o_custkey").agg(
        F.datediff(anchor, F.max("o_orderdate")).alias("recency_days"),
        F.count("*").alias("frequency"),
        F.sum("o_totalprice").alias("monetary"),
    )
    scored = rfm.select(
        "o_custkey",
        "monetary",
        F.ntile(4)
        .over(Window.orderBy(F.asc("recency_days"), F.asc("o_custkey")))
        .alias("r_score"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("frequency"), F.asc("o_custkey")))
        .alias("f_score"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("monetary"), F.asc("o_custkey")))
        .alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_customers"),
            q(F.sum("monetary"), 2).alias("total_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@register(
    "attribution_last_touch",
    oracle="""
    WITH carried AS (
      SELECT user_id, ts, event_type, value,
             MAX(CASE WHEN event_type IN ('view', 'click', 'signup')
                      THEN EPOCH_US(ts) * 4
                           + CASE event_type WHEN 'view' THEN 0
                                             WHEN 'click' THEN 1
                                             ELSE 2 END
                 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_packed
      FROM events
    ), attributed AS (
      SELECT CASE
               WHEN touch_packed IS NULL THEN 'organic'
               WHEN EPOCH_US(ts) - touch_packed // 4 > 86400000000
                 THEN 'organic'
               ELSE CASE touch_packed % 4 WHEN 0 THEN 'view'
                                          WHEN 1 THEN 'click'
                                          ELSE 'signup' END
             END AS channel,
             value
      FROM carried
      WHERE event_type = 'purchase'
    )
    SELECT channel,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM attributed
    GROUP BY channel
    ORDER BY channel
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to the
    user's most recent view/click/signup within a 24 h lookback, else
    'organic'.

    The last touch is carried as ONE packed BIGINT (micros×4 + type code)
    under a prefix-MAX window — the IGNORE NULLS-free encoding this repo
    uses for cross-engine last-value semantics (see
    timeseries_interpolate_linear). One shuffle on user_id total; revenue
    summed in integer cents so the hash cannot drift with summation order.
    """
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = F.max(
        F.when(
            F.col("event_type").isin("view", "click", "signup"),
            F.unix_micros("ts") * 4
            + F.when(F.col("event_type") == "view", 0)
            .when(F.col("event_type") == "click", 1)
            .otherwise(2),
        )
    ).over(w)
    carried = ev.withColumn("touch_packed", packed).where(
        F.col("event_type") == "purchase"
    )
    channel = (
        F.when(F.col("touch_packed").isNull(), "organic")
        .when(
            F.unix_micros("ts") - F.floor(F.col("touch_packed") / 4)
            > 86_400_000_000,
            "organic",
        )
        .otherwise(
            F.when(F.col("touch_packed") % 4 == 0, "view")
            .when(F.col("touch_packed") % 4 == 1, "click")
            .otherwise("signup")
        )
    )
    return (
        carried.select(channel.alias("channel"), "value")
        .groupBy("channel")
        .agg(
            F.count("*").alias("n_purchases"),
            # per-row cents before the sum — the docstring's claim, now
            # actually true (r11; the old sum-then-round drifted with
            # summation order at large SF)
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .cast("bigint")
            .alias("revenue_cents"),
        )
        .orderBy("channel")
    )


@register(
    "market_basket_rules",
    oracle=f"""
    WITH baskets AS (
      SELECT l_orderkey, l_partkey
      FROM lineitem
      GROUP BY l_orderkey, l_partkey
    ), n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM baskets),
    item AS (
      SELECT l_partkey, COUNT(*) AS n_item FROM baskets GROUP BY l_partkey
    ), pair AS (
      SELECT a.l_partkey AS antecedent, b.l_partkey AS consequent,
             COUNT(*) AS n_pair
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
    )
    SELECT antecedent, consequent, n_pair,
           {q_sql('CAST(n_pair AS DOUBLE) / ia.n_item', 6)} AS confidence,
           {q_sql(
               'CAST(n_pair AS DOUBLE) * n.n_orders'
               ' / (ia.n_item * CAST(ic.n_item AS DOUBLE))', 4
           )} AS lift
    FROM pair
    JOIN item ia ON ia.l_partkey = antecedent
    JOIN item ic ON ic.l_partkey = consequent
    CROSS JOIN n
    WHERE n_pair >= 3
    ORDER BY lift DESC, antecedent, consequent
    LIMIT 20
    """,
)
def market_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules antecedent→consequent with support count,
    confidence and lift — the step after market_basket_pairs
    (graph.py:211) that turns co-occurrence into directional rules.

    Plan: one shuffle builds per-order distinct part sets; ordered pairs
    expand IN-ROW (both directions from the same sorted array — no
    lineitem self-join); item supports aggregate from the same exploded
    baskets. The pair→support joins are item-cardinality vs
    item-cardinality, which AQE broadcasts; the basket count is a scalar
    cross join. Min-support 3 prunes the rule tail before the joins.
    """
    li = load_tables(spark, sf_dir, names=("lineitem",))["lineitem"]
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    baskets = baskets.persist()
    n_orders = baskets.count()
    # persisted: item feeds both the antecedent and consequent join sides —
    # uncached, the explode + aggregate runs once per side (guide §5)
    item = baskets.select(F.explode("parts").alias("l_partkey")).groupBy(
        "l_partkey"
    ).agg(F.count("*").alias("n_item")).persist()
    pair_expand = F.expr(
        "flatten(transform(parts, x ->"
        " transform(filter(parts, y -> y <> x),"
        "           y -> struct(x AS antecedent, y AS consequent))))"
    )
    pair = (
        baskets.select(F.explode(pair_expand).alias("pr"))
        .select("pr.antecedent", "pr.consequent")
        .groupBy("antecedent", "consequent")
        .agg(F.count("*").alias("n_pair"))
        .where(F.col("n_pair") >= 3)
    )
    ia = item.select(
        F.col("l_partkey").alias("antecedent"), F.col("n_item").alias("na")
    )
    ic = item.select(
        F.col("l_partkey").alias("consequent"), F.col("n_item").alias("nc")
    )
    return (
        pair.join(ia, "antecedent")
        .join(ic, "consequent")
        .select(
            "antecedent",
            "consequent",
            "n_pair",
            q(F.col("n_pair").cast("double") / F.col("na"), 6).alias(
                "confidence"
            ),
            q(
                F.col("n_pair").cast("double")
                * F.lit(n_orders)
                / (F.col("na") * F.col("nc").cast("double")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "antecedent", "consequent")
        .limit(20)
    )


@register(
    "gdpr_delete_propagation",
    oracle="""
    WITH tombstones AS (
      SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
    ), kept_customers AS (
      SELECT c.* FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM tombstones t
                        WHERE t.c_custkey = c.c_custkey)
    ), kept_orders AS (
      SELECT o.* FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM tombstones t
                        WHERE t.c_custkey = o.o_custkey)
    ), kept_lineitem AS (
      SELECT l.* FROM lineitem l
      WHERE EXISTS (SELECT 1 FROM kept_orders o
                    WHERE o.o_orderkey = l.l_orderkey)
    )
    SELECT
      (SELECT COUNT(*) FROM tombstones)      AS n_tombstones,
      (SELECT COUNT(*) FROM kept_customers)  AS n_customers_kept,
      (SELECT COUNT(*) FROM kept_orders)     AS n_orders_kept,
      (SELECT COUNT(*) FROM kept_lineitem)   AS n_lineitems_kept,
      (SELECT CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
       FROM kept_orders)                     AS kept_revenue_cents
    """,
)
def gdpr_delete_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure cascade: given a tombstone set of customer keys,
    delete the customers, their orders, and those orders' lineitems, and
    report surviving row counts plus a revenue checksum proving referential
    integrity of the survivors.

    Spark plan: tombstones (tiny by construction — regulator requests) are
    LEFT ANTI joined against customer and orders; the surviving order keys
    then LEFT SEMI filter lineitem. AQE broadcasts the tombstone side so
    neither fact table shuffles; the semi join on kept orders is the only
    key exchange and it carries order keys, not rows. In a lakehouse
    deployment the same plan feeds MERGE ... WHEN MATCHED THEN DELETE
    (see merge_upsert / scd2_apply_changes in this repo for the write
    side); this query is the audit read that precedes the write.
    """
    t = load_tables(spark, sf_dir, names=("customer", "orders", "lineitem"))
    tomb = t["customer"].where(F.col("c_custkey") % 97 == 0).select("c_custkey")
    kept_c = t["customer"].join(tomb, "c_custkey", "left_anti")
    kept_o = t["orders"].join(
        tomb.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", "left_anti"
    )
    kept_l = t["lineitem"].join(
        kept_o.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_semi",
    )
    counts = (
        tomb.agg(F.count("*").alias("n_tombstones"))
        .crossJoin(kept_c.agg(F.count("*").alias("n_customers_kept")))
        .crossJoin(
            kept_o.agg(
                F.count("*").alias("n_orders_kept"),
                # per-row integer cents BEFORE the sum (r11: a sum of ~1.5M
                # raw doubles drifted one cent from DuckDB's differently-
                # ordered sum at the true-sf1 gate; quantize-then-BIGINT-sum
                # is order-free and exact)
                F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
                .cast("bigint")
                .alias("kept_revenue_cents"),
            )
        )
        .crossJoin(kept_l.agg(F.count("*").alias("n_lineitems_kept")))
    )
    return counts.select(
        "n_tombstones",
        "n_customers_kept",
        "n_orders_kept",
        "n_lineitems_kept",
        "kept_revenue_cents",
    )
