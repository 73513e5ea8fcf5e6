"""TPC-H classics, third batch: Q2/Q4/Q9/Q11/Q12/Q13/Q16/Q19/Q20/Q21/Q22
shapes — completing all 22 TPC-H query shapes in the registry.

The synthetic star schema has no partsupp table and no shipmode /
commitdate / receiptdate / comment columns, so each query keeps its
canonical STRUCTURE (the thing a user switching engines cares about) with
an adapted predicate:

- partsupp is replaced by the observed supplies relation — DISTINCT
  (l_partkey, l_suppkey) from lineitem (Q2/Q16/Q20);
- supplycost stand-ins: s_acctbal for Q2's min-cost supplier,
  p_retailprice for Q9's profit and Q11's stock value;
- Q4/Q21's late-delivery EXISTS tests use l_returnflag = 'R';
- Q12 groups by l_linestatus instead of l_shipmode;
- Q13/Q16's comment NOT-LIKE filters become priority/acctbal predicates;
- Q22's country code is the last two digits of c_name.

Money discipline (oracle-determinism playbook): every money aggregate is
summed as BIGINT cents — ``ROUND(x*100)::BIGINT`` per row on both engines
— never a double sum (parallel summation order) and never DECIMAL
(DuckDB's widening rules are version-dependent). Scalar thresholds that
the classics express as fractions (Q11's 0.001, Q20's half, Q22's
average) are compared in exact integer arithmetic (``v*1000 > total``,
``2*sq > pq``, ``bal*n > sum``) so no engine ever rounds a boundary row
differently.

Scale posture: dimension chains broadcast before touching lineitem; the
fact table shuffles only on its own aggregate keys; correlated
subqueries become window/aggregate-then-join forms (one extra exchange on
an already-reduced input, never a per-row re-scan); top-k outputs order
by a unique tiebreak and compile to TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_tables


def _ts(day: str):
    return F.lit(day).cast("timestamp_ntz")


def _cents(col) -> F.Column:
    """Per-row BIGINT cents (exact, order-independent under SUM)."""
    return F.round(col * 100).cast("long")


_CENTS_SQL = "CAST(ROUND(({x}) * 100) AS BIGINT)"


def _supplies(t) -> DataFrame:
    """The observed supplies relation: DISTINCT (l_partkey, l_suppkey) —
    the partsupp stand-in. One shuffle on the pair; at 100 TB this is the
    same dedup-by-key pattern as dedup_keep_first_by_key."""
    return t["lineitem"].select("l_partkey", "l_suppkey").distinct()


_SUPPLIES_SQL = "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem"


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH supplies AS ({_SUPPLIES_SQL}),
    europe_supp AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    ranked AS (
      SELECT p.p_partkey, p.p_brand, e.s_name, e.n_name, e.s_acctbal,
             ROW_NUMBER() OVER (PARTITION BY p.p_partkey
                                ORDER BY e.s_acctbal, e.s_suppkey) AS rn
      FROM part p
      JOIN supplies sp ON sp.l_partkey = p.p_partkey
      JOIN europe_supp e ON e.s_suppkey = sp.l_suppkey
      WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'STANDARD'
    )
    SELECT p_partkey, p_brand, s_name, n_name, s_acctbal
    FROM ranked WHERE rn = 1
    ORDER BY s_acctbal DESC, p_partkey
    LIMIT 50
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each mid-size STANDARD
    part, the cheapest EUROPE supplier that actually supplies it (min
    s_acctbal as the supplycost stand-in, supplier key tiebreak), top-50
    by cost descending. The classic correlated MIN subquery becomes a
    row_number window over the supplies×supplier join — one exchange on
    the already-reduced candidate set, and the rank filter compiles to a
    partial WindowGroupLimit below it."""
    t = load_tables(
        spark, sf_dir, names=("part", "supplier", "nation", "region", "lineitem")
    )
    europe_supp = (
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].join(
                    t["region"].filter(F.col("r_name") == "EUROPE"),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = t["part"].filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
    )
    w = Window.partitionBy("p_partkey").orderBy("s_acctbal", "s_suppkey")
    return (
        _supplies(t)
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(europe_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "p_brand", "s_name", "n_name", "s_acctbal")
        .orderBy(F.col("s_acctbal").desc(), "p_partkey")
        .limit(50)
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): orders in one quarter
    with at least one problem lineitem (returnflag 'R' standing in for
    commit<receipt lateness), counted per priority. The correlated EXISTS
    is a LEFT SEMI join — the probe side never duplicates orders however
    many 'R' lines an order has, and the quarter filter is
    parquet-pushable on the orders scan."""
    t = load_tables(spark, sf_dir, names=("orders", "lineitem"))
    quarter = t["orders"].filter(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    problem = t["lineitem"].filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        quarter.join(problem, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q9_product_type_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(date_part('year', o.o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM({_CENTS_SQL.format(
               x="l.l_extendedprice * (1 - l.l_discount) - 0.5 * p.p_retailprice * l.l_quantity"
           )}) AS BIGINT) AS profit_cents
    FROM lineitem l
    JOIN part p     ON p.p_partkey  = l.l_partkey
    JOIN supplier s ON s.s_suppkey  = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_type = 'ECONOMY'
    GROUP BY n.n_name, date_part('year', o.o_orderdate)
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit per supplier nation
    per order year for one product line, profit = revenue − cost with
    0.5·p_retailprice·quantity standing in for ps_supplycost·quantity.
    Cents are computed per ROW then summed as BIGINT, so the group sum is
    exact and summation-order-free on both engines. part and
    supplier→nation broadcast; lineitem shuffles once for the orders join
    and once for the final group-by."""
    t = load_tables(
        spark, sf_dir, names=("lineitem", "part", "supplier", "nation", "orders")
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    )
    supp_nation = t["supplier"].join(
        F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "n_name")
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_type") == "ECONOMY")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(_cents(profit)).cast("long").alias("profit_cents"))
    )


@register(
    "q11_important_stock",
    oracle=f"""
    WITH vals AS (
      SELECT l.l_partkey AS p_partkey,
             CAST(SUM({_CENTS_SQL.format(x="p.p_retailprice * l.l_quantity")}) AS BIGINT)
               AS value_cents
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN part p     ON p.p_partkey = l.l_partkey
      WHERE s.s_nationkey = 7
      GROUP BY l.l_partkey
    )
    SELECT v.p_partkey, v.value_cents
    FROM vals v, (SELECT SUM(value_cents) AS total_cents FROM vals) tot
    WHERE v.value_cents * 1000 > tot.total_cents
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): per-part supplied
    value (retailprice·quantity as the supplycost·availqty stand-in) for
    one nation's suppliers, keeping parts above a fraction of the nation's
    total. The scalar subquery is an aggregate of the SAME grouped
    intermediate — Spark computes it once from the persisted grouped frame
    and broadcasts the single row; the 0.001 threshold compares in integer
    cents (v*1000 > total), so no boundary row can round differently."""
    t = load_tables(spark, sf_dir, names=("lineitem", "supplier", "part"))
    vals = (
        t["lineitem"]
        .join(
            F.broadcast(t["supplier"].filter(F.col("s_nationkey") == 7)),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(t["part"].select("p_partkey", "p_retailprice")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(
            F.sum(_cents(F.col("p_retailprice") * F.col("l_quantity")))
            .cast("long")
            .alias("value_cents")
        )
        .persist()
    )
    total = vals.agg(F.sum("value_cents").cast("long").alias("total_cents"))
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("total_cents"))
        .select("p_partkey", "value_cents")
    )


@register(
    "q12_ship_priority_by_status",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q12_ship_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / order priority): one year of
    lineitems, priority split counted per l_linestatus (the shipmode
    stand-in). One fact-fact join on the order key and ONE pass of
    conditional aggregation — the classic two-CASE fused count."""
    t = load_tables(spark, sf_dir, names=("orders", "lineitem"))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer distribution): orders-per-customer
    histogram including zero-order customers — the LEFT join with the
    exclusion predicate ON THE JOIN (priority '4-NOT SPECIFIED' standing
    in for the comment NOT LIKE), so excluded orders count as absent
    rather than dropping the customer. Two aggregations: the first
    shuffles on c_custkey, the second on the tiny c_count domain."""
    t = load_tables(spark, sf_dir, names=("customer", "orders"))
    per_cust = (
        t["customer"]
        .join(
            t["orders"].filter(F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").cast("long").alias("custdist"))


@register(
    "q16_parts_supplier_relationship",
    oracle=f"""
    WITH supplies AS ({_SUPPLIES_SQL})
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT sp.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM supplies sp
    JOIN part p ON p.p_partkey = sp.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50)
      AND sp.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    count per (brand, type, size) bucket over the observed supplies
    relation, excluding one brand, one type, and blacklisted suppliers
    (negative balance standing in for 'Customer Complaints'). The NOT IN
    is a LEFT ANTI join against the tiny blacklist — never a per-row
    subquery — and the count-distinct shuffles the already-distinct pair
    relation once on the group keys."""
    t = load_tables(spark, sf_dir, names=("lineitem", "part", "supplier"))
    parts = t["part"].filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50)
    )
    blacklist = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        _supplies(t)
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(blacklist),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT CAST(SUM({_CENTS_SQL.format(x="l.l_extendedprice * (1 - l.l_discount)")}) AS BIGINT)
             AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates): three
    OR-ed brand/size/quantity brackets across the part join. The join key
    stays the plain equi-join on p_partkey with the disjunction as a
    post-join filter — Catalyst broadcasts the part side. The enclosing
    quantity bound (l_quantity BETWEEN 1 AND 30, implied by the union of
    the brackets) is applied EXPLICITLY before the join: Catalyst does not
    infer range bounds out of a disjunction, and at 100 TB that redundant
    conjunct is what lets the parquet scan prune row groups instead of
    reading all of lineitem. Revenue in BIGINT cents."""
    t = load_tables(spark, sf_dir, names=("lineitem", "part"))
    bracket = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .filter(F.col("l_quantity").between(1, 30))
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .filter(bracket)
        .agg(
            F.sum(_cents(rev)).cast("long").alias("revenue_cents"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


@register(
    "q20_dominant_suppliers",
    oracle=f"""
    WITH sq AS (
      SELECT l.l_suppkey, l.l_partkey,
             CAST(SUM({_CENTS_SQL.format(x="l.l_quantity")}) AS BIGINT) AS supp_qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_type = 'SMALL'
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l.l_suppkey, l.l_partkey
    ),
    dominant AS (
      SELECT DISTINCT l_suppkey FROM (
        SELECT l_suppkey, supp_qty,
               SUM(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
        FROM sq
      ) WHERE 2 * supp_qty > part_qty
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND s.s_suppkey IN (SELECT l_suppkey FROM dominant)
    """,
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers in one nation
    who supplied MORE THAN HALF of some SMALL part's shipped quantity in
    1996 (the availqty > 0.5·sum correlated subquery, in observed-supply
    form). The per-part total is a window over the (supp, part) aggregate
    — one extra exchange on the reduced intermediate — and the half
    threshold compares integer quantity-cents (2·sq > pq), exact on both
    engines. The final IN is a semi join onto the region's suppliers."""
    t = load_tables(
        spark, sf_dir, names=("lineitem", "part", "supplier", "nation", "region")
    )
    sq = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
        )
        .join(
            F.broadcast(t["part"].filter(F.col("p_type") == "SMALL")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_cents(F.col("l_quantity"))).cast("long").alias("supp_qty"))
    )
    part_total = Window.partitionBy("l_partkey")
    dominant = (
        sq.withColumn("part_qty", F.sum("supp_qty").over(part_total))
        .filter(2 * F.col("supp_qty") > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    asia = (
        t["nation"]
        .join(
            t["region"].filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    return (
        t["supplier"]
        .join(F.broadcast(asia), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): for finalized
    orders, the supplier who was the ONLY one with problem lines
    (returnflag 'R' as the late-delivery stand-in) in a multi-supplier
    order. The classic EXISTS/NOT-EXISTS double correlation is computed
    as ONE per-order aggregate — distinct suppliers and distinct
    problem-suppliers per order — then a filter (n_supp > 1 AND
    n_supp_r = 1); the oracle keeps the textbook correlated form, so the
    two formulations check each other. Counts l1 ROWS per the spec (a
    supplier with several problem lines in one order counts each).

    Shuffle discipline (r9, found by tests/shuffle_audit.py): TWO
    countDistinct columns in one agg plan an Expand that doubles every
    lineitem row before the exchange (measured 20.4 MB shuffled at
    sf0.1). Rewritten as a two-level aggregate: level 1 groups by
    (l_orderkey, l_suppkey) — the partial agg dedups pairs map-side, so
    the exchange carries distinct pairs, not 2x rows — and level 2
    counts suppliers / problem-suppliers per order. Same semantics
    (n_supp_r == countDistinct over the R-filtered supplier set), half
    the shuffle."""
    t = load_tables(spark, sf_dir, names=("supplier", "lineitem", "orders"))
    li = t["lineitem"]
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(
            F.when(F.col("l_returnflag") == "R", F.lit(1)).otherwise(F.lit(0))
        ).alias("has_r")
    )
    order_stats = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("has_r").alias("n_supp_r"),
    )
    waiting = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            order_stats.filter((F.col("n_supp") > 1) & (F.col("n_supp_r") == 1)),
            "l_orderkey",
            "left_semi",
        )
    )
    return (
        waiting.join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@register(
    "q22_global_sales_opportunity",
    oracle=f"""
    WITH codes AS (
      SELECT c_custkey, c_acctbal, right(c_name, 2) AS cntrycode
      FROM customer
      WHERE right(c_name, 2) IN ('13', '31', '23', '29', '30', '18', '17')
    ),
    pos AS (
      SELECT CAST(SUM({_CENTS_SQL.format(x="c_acctbal")}) AS BIGINT) AS sum_cents,
             CAST(COUNT(*) AS BIGINT) AS n_pos
      FROM codes WHERE c_acctbal > 0.0
    )
    SELECT cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM({_CENTS_SQL.format(x="c_acctbal")}) AS BIGINT) AS totacctbal_cents
    FROM codes, pos
    WHERE {_CENTS_SQL.format(x="c_acctbal")} * pos.n_pos > pos.sum_cents
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = codes.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2001-01-01'
      )
    GROUP BY cntrycode
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): customers from selected
    'country codes' (last two digits of c_name) with above-average
    positive balance and no RECENT orders (none in the data's final year —
    every synthetic customer has historical orders, so the classic
    no-orders-ever predicate would be vacuously empty). The scalar average
    is compared in exact integer form — bal_cents·n > sum_cents — so no
    boundary customer can round across the threshold differently per
    engine; the NOT EXISTS is a LEFT ANTI join on the orders key with the
    date filter pushed to the orders scan."""
    t = load_tables(spark, sf_dir, names=("customer", "orders"))
    codes = (
        t["customer"]
        .withColumn("cntrycode", F.expr("right(c_name, 2)"))
        .filter(F.col("cntrycode").isin("13", "31", "23", "29", "30", "18", "17"))
        .select("c_custkey", "c_acctbal", "cntrycode")
        .persist()
    )
    pos = codes.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(_cents(F.col("c_acctbal"))).cast("long").alias("sum_cents"),
        F.count("*").cast("long").alias("n_pos"),
    )
    return (
        codes.crossJoin(F.broadcast(pos))
        .filter(_cents(F.col("c_acctbal")) * F.col("n_pos") > F.col("sum_cents"))
        .join(
            t["orders"]
            .filter(F.col("o_orderdate") >= _ts("2001-01-01"))
            .select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("cntrycode")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.sum(_cents(F.col("c_acctbal"))).cast("long").alias("totacctbal_cents"),
        )
    )
