"""Classic OLAP operators the reference's SQL surface implies but never
names: skyline (Pareto frontier) and interval coverage (gaps-and-islands
union of overlapping spans).

Both are pure relational formulations — no UDFs, no iteration — so DuckDB
verifies them end-to-end.

Scale posture:
- Skyline reduces the dominance test to prefix maxima over the
  DISTINCT-PRICE table: one bounded-cardinality aggregate of the fact
  table, a window over that small table, and a join back (AQE broadcasts
  the per-price frontier). The naive NOT EXISTS self-join is O(n²) and
  unshippable at 100 TB; this plan touches the fact table exactly twice,
  both times embarrassingly parallel. The ordered window runs over
  distinct prices only — bounded for any real dimension; were it not, the
  standard fix is range-partition the price axis and prefix-max per range
  with a tiny carried-boundary table (the two-phase pattern used by
  agg_skew_two_phase).
- Interval coverage shuffles ONCE on the entity key; island detection is
  a prefix-max window inside each key partition (no cross-key traffic),
  and the island rollup reuses the same partitioning. Top-k via
  TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_tables


@register(
    "skyline_pareto",
    oracle="""
    WITH byprice AS (
      SELECT p_retailprice AS price, MAX(p_size) AS ms
      FROM part GROUP BY 1
    ), run AS (
      SELECT price, ms,
             MAX(ms) OVER (ORDER BY price ROWS UNBOUNDED PRECEDING) AS m_le
      FROM byprice
    ), frontier AS (
      SELECT price, m_le,
             LAG(m_le) OVER (ORDER BY price) AS m_lt
      FROM run
    )
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p JOIN frontier f ON f.price = p.p_retailprice
    WHERE NOT ((f.m_lt IS NOT NULL AND f.m_lt >= p.p_size)
               OR (f.m_le > p.p_size))
    ORDER BY p.p_retailprice, p.p_partkey
    """,
)
def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query: parts not dominated on (price ↓, size ↑) — q
    dominates p iff q is no worse on both axes and strictly better on one.

    Formulation: a part is dominated iff some part with strictly lower
    price has size ≥ its size (prefix max over cheaper prices), OR some
    part with price ≤ its price has size strictly greater (prefix max
    including price ties). Both maxima come from ONE window pass over the
    distinct-price rollup; the LAG turns "≤" prefix into "<" prefix
    without any EXCLUDE CURRENT ROW frame (Spark has none). The join back
    on the exact double is safe: both engines compare the identical
    parquet-read bits (same convention as filter P2).
    """
    part = load_tables(spark, sf_dir, names=("part",))["part"]
    byprice = part.groupBy(F.col("p_retailprice").alias("price")).agg(
        F.max("p_size").alias("ms")
    )
    w_le = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, 0)
    run = byprice.select("price", F.max("ms").over(w_le).alias("m_le"))
    frontier = run.select(
        "price", "m_le", F.lag("m_le").over(Window.orderBy("price")).alias("m_lt")
    )
    joined = part.join(frontier, part.p_retailprice == frontier.price)
    dominated = (F.col("m_lt").isNotNull() & (F.col("m_lt") >= F.col("p_size"))) | (
        F.col("m_le") > F.col("p_size")
    )
    return (
        joined.where(~dominated)
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_partkey")
    )


@register(
    "interval_coverage_merge",
    oracle="""
    WITH spans AS (
      SELECT o_custkey, o_orderkey, o_orderdate AS s,
             o_orderdate + INTERVAL 7 DAY AS e
      FROM orders
    ), flagged AS (
      SELECT o_custkey, o_orderkey, s, e,
             CASE WHEN MAX(e) OVER (PARTITION BY o_custkey
                                    ORDER BY s, o_orderkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING) >= s
                  THEN 0 ELSE 1 END AS is_new
      FROM spans
    ), islands AS (
      -- SAME total order (s, o_orderkey) as the is_new window: ordering
      -- the running sum by (s, e) left tied (s, e) rows in nondeterministic
      -- frame order, which flipped island boundaries when the is_new=1 row
      -- of a tie landed second (caught flaky at the true-sf1 gate, r11)
      SELECT o_custkey, s, e,
             SUM(is_new) OVER (PARTITION BY o_custkey ORDER BY s, o_orderkey
                               ROWS UNBOUNDED PRECEDING) AS island_id
      FROM flagged
    ), merged AS (
      SELECT o_custkey, island_id, MIN(s) AS island_start, MAX(e) AS island_end
      FROM islands GROUP BY o_custkey, island_id
    )
    SELECT o_custkey,
           COUNT(*) AS n_islands,
           CAST(SUM(DATE_DIFF('day', island_start, island_end)) AS BIGINT)
             AS covered_days
    FROM merged
    GROUP BY o_custkey
    ORDER BY covered_days DESC, o_custkey
    LIMIT 20
    """,
)
def interval_coverage_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of overlapping per-customer activity spans (each order opens a
    7-day window): merge overlaps into islands, report island count and
    total covered days per customer — the gaps-and-islands operator behind
    SLA coverage, incident dedup, and sessionized billing.

    An island starts where a span's start exceeds the running max end of
    all earlier spans (prefix max, 1 PRECEDING); island ids are the
    running sum of those starts. All three windows and the final rollup
    share the o_custkey partitioning — one shuffle total.
    """
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    spans = orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")).alias("e"),
    )
    w_prev = (
        Window.partitionBy("o_custkey")
        .orderBy("s", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = spans.select(
        "o_custkey",
        "o_orderkey",
        "s",
        "e",
        F.when(F.max("e").over(w_prev) >= F.col("s"), 0).otherwise(1).alias("is_new"),
    )
    # same total order as w_prev — an (s, e) order left tied rows in
    # nondeterministic frame order and flipped island boundaries (r11)
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy("s", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.select(
        "o_custkey", "s", "e", F.sum("is_new").over(w_run).alias("island_id")
    )
    merged = islands.groupBy("o_custkey", "island_id").agg(
        F.min("s").alias("island_start"), F.max("e").alias("island_end")
    )
    return (
        merged.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_islands"),
            F.sum(F.datediff("island_end", "island_start"))
            .cast("bigint")
            .alias("covered_days"),
        )
        .orderBy(F.desc("covered_days"), "o_custkey")
        .limit(20)
    )


@register(
    "olap_share_shift",
    oracle="""
    WITH rev AS (
      SELECT c.c_mktsegment AS segment,
             CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_mktsegment, CAST(date_trunc('month', o.o_orderdate) AS DATE)
    ), shared AS (
      SELECT segment, month, rev_cents,
             CAST(FLOOR(rev_cents * 1000000.0
                        / SUM(rev_cents) OVER (PARTITION BY month) + 0.5)
                  AS BIGINT) AS share_micro
      FROM rev
    )
    SELECT segment, month, rev_cents, share_micro,
           share_micro - LAG(share_micro) OVER (PARTITION BY segment
                                                ORDER BY month)
             AS share_delta_micro
    FROM shared
    """,
)
def olap_share_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-share shift report: each segment's share of monthly revenue
    and its month-over-month delta — the BI staple behind every 'who is
    gaining share' dashboard, and a one-query composition of the repo's
    window discipline: share = row/total within month (window over the
    collapsed rollup, integer-cents numerators, one floor-quantized
    division), delta = LAG within segment across months. The raw fact
    rows collapse to (segment × month) in the FIRST aggregate; both
    windows and the join run on that tiny grid. Customer dim broadcasts
    onto the orders scan."""
    t = load_tables(spark, sf_dir, names=("orders", "customer"))
    rev = (
        t["orders"]
        .join(
            F.broadcast(t["customer"]),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.to_date(F.date_trunc("month", "o_orderdate")).alias("month"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    shared = rev.select(
        "segment",
        "month",
        "rev_cents",
        F.floor(
            F.col("rev_cents")
            * 1_000_000.0
            / F.sum("rev_cents").over(Window.partitionBy("month"))
            + 0.5
        )
        .cast("bigint")
        .alias("share_micro"),
    )
    return shared.withColumn(
        "share_delta_micro",
        F.col("share_micro")
        - F.lag("share_micro").over(Window.partitionBy("segment").orderBy("month")),
    )


@register(
    "olap_abc_classification",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM lineitem GROUP BY l_partkey
    ), ranked AS (
      SELECT l_partkey, rev_cents,
             CAST(SUM(rev_cents) OVER (ORDER BY rev_cents DESC, l_partkey
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS BIGINT) AS cum_rev,
             CAST(SUM(rev_cents) OVER () AS BIGINT) AS total_rev
      FROM rev
    ), classed AS (
      SELECT l_partkey, rev_cents,
             CASE WHEN cum_rev * 100 <= total_rev * 80 THEN 'A'
                  WHEN cum_rev * 100 <= total_rev * 95 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM ranked
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(rev_cents) AS BIGINT) AS class_rev_cents
    FROM classed GROUP BY abc_class
    """,
)
def olap_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of parts by revenue: rank descending,
    A = parts inside the first 80% of cumulative revenue, B = the next
    15%, C = the tail — the inventory-management classic behind every
    'top 20% of SKUs drive 80% of revenue' analysis. Class boundaries
    compare INTEGER cross-products (cum·100 vs total·80/95), so boundary
    membership can't float-drift, and the rank order ties on partkey so
    the cumulative sum itself is deterministic. The fact table collapses
    to part cardinality first; the cumulative window runs on that rollup
    (single-partition, but bounded by |parts|, not |lineitem| — at true
    catalog scale range-partition the rollup by revenue bucket and
    two-phase the running sum)."""
    li = load_tables(spark, sf_dir, names=("lineitem",))["lineitem"]
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents")
    )
    w = Window.orderBy(F.desc("rev_cents"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = rev.select(
        "l_partkey",
        "rev_cents",
        F.sum("rev_cents").over(w).cast("bigint").alias("cum_rev"),
        F.sum("rev_cents").over(Window.partitionBy()).cast("bigint").alias("total_rev"),
    )
    abc = (
        F.when(F.col("cum_rev") * 100 <= F.col("total_rev") * 80, "A")
        .when(F.col("cum_rev") * 100 <= F.col("total_rev") * 95, "B")
        .otherwise("C")
    )
    return (
        ranked.select("rev_cents", abc.alias("abc_class"))
        .groupBy("abc_class")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.sum("rev_cents").cast("bigint").alias("class_rev_cents"),
        )
    )
