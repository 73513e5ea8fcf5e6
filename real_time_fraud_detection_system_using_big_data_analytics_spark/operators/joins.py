"""Join operators: equi (broadcast / shuffle), multi-way, outer, semi, anti,
range (non-equi), as-of.

The reference implements no joins at all (SURVEY §2.11 — its nearest
analogue is the broadcast-map lookup inside StringIndexer); this module
provides the full join surface a user of a relational engine expects.

Scale posture:
- dimension tables (region/nation/customer at star-schema proportions) are
  broadcast explicitly — no shuffle of the fact side;
- fact-fact joins shuffle on the join key; AQE handles skew;
- the as-of join is expressed as a windowed dedup over a bounded-range
  pair join. At 100 TB the unbounded variant is replaced by time-bucketing
  (join on (key, bucket) for the K most recent buckets) — the implementation
  keeps the range predicate tight for exactly that reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import rev_e4
from ..plans.registry import register
from ..sources.tables import load_tables


@register(
    "join_broadcast_dim",
    oracle="""
    SELECT n.n_name AS nation, COUNT(*) AS n_customers,
           ROUND(SUM(c.c_acctbal), 2) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast dims: customer joined through nation to region.

    Both dim joins broadcast (`F.broadcast`) — the customer scan never
    shuffles; the only shuffle is the final small groupBy.
    """
    t = load_tables(spark, sf_dir, names=("customer", "nation", "region"))
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register(
    "join_multiway_revenue",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(SUM((CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT) * (100 - CAST(FLOOR(l.l_discount * 100 + 0.5) AS BIGINT)))) AS DOUBLE) / 10000.0 AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def join_multiway_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped 4-way join. lineitem⋈orders shuffles on orderkey;
    customer and nation broadcast. Filter on o_orderdate is pushed below
    the join by Catalyst (visible as PushedFilters on the orders scan)."""
    t = load_tables(spark, sf_dir, names=("lineitem", "orders", "customer", "nation"))
    return (
        t["lineitem"]
        .join(t["orders"].filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            (F.sum(rev_e4()).cast("double") / 10000.0).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey,
           COUNT(o.o_orderkey)                       AS n_orders,
           ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS total_spent
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no orders; COUNT of a
    nullable column + COALESCE'd sum give identical null semantics in both
    engines."""
    t = load_tables(spark, sf_dir, names=("customer", "orders"))
    return (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join = EXISTS. Only the key column of the build side is
    shuffled; no row multiplication."""
    t = load_tables(spark, sf_dir, names=("customer", "orders"))
    big = t["orders"].filter(F.col("o_totalprice") > 300000)
    return (
        t["customer"]
        .join(big, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join = NOT EXISTS (customers that never ordered)."""
    t = load_tables(spark, sf_dir, names=("customer", "orders"))
    return (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@register(
    "join_range",
    oracle="""
    SELECT o.o_orderkey, COUNT(*) AS n_shipped_30d
    FROM orders o
    JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
    GROUP BY o.o_orderkey
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range join: lineitems shipped within 30 days of their order.
    The equi key (orderkey) carries the shuffle; the range condition is a
    post-join filter inside the same sort-merge join — no cross product."""
    t = load_tables(spark, sf_dir, names=("orders", "lineitem"))
    o, li = t["orders"], t["lineitem"]
    # timestamp + interval (not date_add, which truncates to DATE)
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 30 DAYS"))
    )
    return o.join(li, cond).groupBy("o_orderkey").agg(F.count("*").alias("n_shipped_30d"))


@register(
    "join_asof",
    oracle="""
    WITH pairs AS (
      SELECT e.event_id, e.user_id, e.ts AS error_ts,
             p.ts AS purchase_ts, p.value AS purchase_value,
             ROW_NUMBER() OVER (PARTITION BY e.event_id
                                ORDER BY p.ts DESC, p.event_id DESC) AS rn
      FROM events e
      JOIN events p
        ON p.user_id = e.user_id
       AND p.event_type = 'purchase'
       AND p.ts <= e.ts
      WHERE e.event_type = 'error'
    )
    SELECT event_id, user_id, error_ts, purchase_ts,
           ROUND(purchase_value, 2) AS purchase_value
    FROM pairs WHERE rn = 1
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each error event, the most recent prior purchase by
    the same user. Composition: equi-join on user_id + range predicate,
    then windowed keep-latest (ties broken by event_id for determinism).

    At 100 TB the per-user pair fan-out is bounded by adding a time-bucket
    equi key (join on (user_id, day) for the last K days) — semantics
    preserved, fan-out capped.
    """
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("error_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
        F.col("event_id").alias("p_event_id"),
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("purchase_ts").desc(), F.col("p_event_id").desc()
    )
    return (
        errors.join(
            purchases,
            (F.col("p_user_id") == F.col("user_id"))
            & (F.col("purchase_ts") <= F.col("error_ts")),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "error_ts",
            "purchase_ts",
            F.round("purchase_value", 2).alias("purchase_value"),
        )
    )


@register(
    "join_full_outer",
    oracle="""
    WITH a AS (
      SELECT o_custkey, COUNT(*) AS orders_1995
      FROM orders WHERE date_part('year', o_orderdate) = 1995 GROUP BY o_custkey
    ),
    b AS (
      SELECT o_custkey, COUNT(*) AS orders_1996
      FROM orders WHERE date_part('year', o_orderdate) = 1996 GROUP BY o_custkey
    )
    SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey,
           CAST(COALESCE(a.orders_1995, 0) AS BIGINT) AS orders_1995,
           CAST(COALESCE(b.orders_1996, 0) AS BIGINT) AS orders_1996,
           CASE WHEN a.o_custkey IS NULL THEN 'only_1996'
                WHEN b.o_custkey IS NULL THEN 'only_1995'
                ELSE 'both' END AS presence
    FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: per-customer order counts for 1995 vs 1996 —
    customers active in only one year produce unmatched rows on BOTH
    sides, the case inner/left joins cannot express. NULL-key semantics
    handled with COALESCE + presence tagging.

    Scale: both inputs are pre-aggregated on the join key before the
    join, so the shuffle carries one row per customer per side (the
    aggregate-then-join rewrite Catalyst cannot do automatically)."""
    o = load_tables(spark, sf_dir, names=("orders",))["orders"]

    def per_year(year: int, out: str) -> DataFrame:
        return (
            o.filter(F.year("o_orderdate") == year)
            .groupBy("o_custkey")
            .agg(F.count("*").alias(out))
            .withColumnRenamed("o_custkey", f"ck_{out}")
        )

    a, b = per_year(1995, "orders_1995"), per_year(1996, "orders_1996")
    return a.join(b, F.col("ck_orders_1995") == F.col("ck_orders_1996"), "full").select(
        F.coalesce("ck_orders_1995", "ck_orders_1996").alias("custkey"),
        F.coalesce("orders_1995", F.lit(0)).cast("long").alias("orders_1995"),
        F.coalesce("orders_1996", F.lit(0)).cast("long").alias("orders_1996"),
        F.when(F.col("ck_orders_1995").isNull(), "only_1996")
        .when(F.col("ck_orders_1996").isNull(), "only_1995")
        .otherwise("both")
        .alias("presence"),
    )


@register(
    "join_asof_pandas",
    oracle="""
    WITH pairs AS (
      SELECT e.event_id, e.user_id, e.ts AS error_ts,
             p.ts AS purchase_ts, p.value AS purchase_value,
             ROW_NUMBER() OVER (PARTITION BY e.event_id
                                ORDER BY p.ts DESC, p.event_id DESC) AS rn
      FROM events e
      JOIN events p
        ON p.user_id = e.user_id
       AND p.event_type = 'purchase'
       AND p.ts <= e.ts
      WHERE e.event_type = 'error'
    )
    SELECT event_id, user_id, error_ts, purchase_ts,
           ROUND(purchase_value, 2) AS purchase_value
    FROM pairs WHERE rn = 1
    """,
)
def join_asof_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME as-of join as `join_asof`, implemented as a cogrouped
    Arrow-batched applyInPandas (pd.merge_asof per user) — the
    custom-operator escape hatch for semantics the relational form can't
    express (SURVEY §2.8: the engine's sanctioned UDF path). Sharing the
    oracle with the relational variant proves the two implementations
    agree value-for-value.

    Scale: cogroup shuffles both sides once (same cost as the equi-join)
    and each group is processed in one Arrow batch; the skew hazard is a
    single hot user, the same hazard the join form has.

    r14 (guide §4.5/§4.2): cogroup on a BUCKET of users (pmod(user_id,
    4 x cores)) and run ONE vectorized `pd.merge_asof(..., by="user_id")`
    per bucket instead of one tiny per-user pandas call per group — the
    per-group python/pandas fixed cost (frame construction + merge setup,
    ~7 ms x thousands of users = ~13 s of the 14.3 s sf0.1 wall) was the
    entire cost of this operator. `by=` keeps the exact per-user
    semantics: both frames sorted globally by the on-key (ties by
    p_event_id — a user's rows form a subsequence, so within-user order
    is identical to the per-user sort), and merge_asof still takes the
    LAST right row at equal timestamps, reproducing the
    (ts DESC, event_id DESC) rank."""
    import pandas as pd

    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    n_buckets = 4 * spark.sparkContext.defaultParallelism
    bkt = F.pmod("user_id", F.lit(n_buckets)).alias("bkt")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("error_ts"), bkt
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
        F.col("event_id").alias("p_event_id"),
        bkt,
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame(
                columns=["event_id", "user_id", "error_ts", "purchase_ts", "purchase_value"]
            )
        left = left.sort_values("error_ts", kind="mergesort")
        # secondary sort by event_id: merge_asof keeps the LAST right row at
        # equal timestamps, reproducing the (ts DESC, event_id DESC) rank
        right = right.sort_values(["purchase_ts", "p_event_id"], kind="mergesort")
        out = pd.merge_asof(
            left,
            right[["user_id", "purchase_ts", "purchase_value"]],
            left_on="error_ts",
            right_on="purchase_ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        out = out.dropna(subset=["purchase_ts"])
        out["purchase_value"] = out["purchase_value"].round(2)
        return out[["event_id", "user_id", "error_ts", "purchase_ts", "purchase_value"]]

    return (
        errors.groupBy("bkt")
        .cogroup(purchases.groupBy("bkt"))
        .applyInPandas(
            merge,
            "event_id bigint, user_id bigint, error_ts timestamp, "
            "purchase_ts timestamp, purchase_value double",
        )
    )


_OVERLAP_SESSIONS_SQL = """
    gaps AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                       > 1800000000 OR
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE user_id % 20 = 0
    ),
    numbered AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM gaps
    ),
    sessions AS (
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             MIN(epoch_us(ts)) AS start_us, MAX(epoch_us(ts)) AS end_us
      FROM numbered GROUP BY user_id, session_id
    )
"""


@register(
    "join_interval_overlap",
    oracle="WITH "
    + _OVERLAP_SESSIONS_SQL
    + """
    SELECT a.user_id AS user_a, a.session_id AS session_a,
           b.user_id AS user_b, b.session_id AS session_b,
           CAST(LEAST(a.end_us, b.end_us) - GREATEST(a.start_us, b.start_us) AS BIGINT)
             AS overlap_us
    FROM sessions a
    JOIN sessions b
      ON a.user_id < b.user_id
     AND a.start_us < b.end_us AND b.start_us < a.end_us
    ORDER BY overlap_us DESC, user_a, session_a, user_b, session_b
    LIMIT 15
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap (theta) join: which user sessions ran concurrently?
    Top-15 cross-user session pairs by overlap duration.

    The oracle joins intervals directly (fine for DuckDB at test SF); the
    Spark plan refuses the quadratic theta join: each session explodes
    into the HOUR BUCKETS it spans, candidates pair on an equi bucket key
    (shuffle on bucket, never a cartesian), dedup on the pair id (a
    session pair sharing several hours matches several times), and the
    exact overlap predicate filters the candidates. This is the standard
    interval-join decomposition: equi-join on a coarse grid + exact
    refinement, the same shape Spark itself plans for stream-stream
    interval joins.

    At 100 TB the bucket width is tuned to median interval length (too
    coarse = fat buckets, too fine = high fan-out); hot buckets (a flash
    event) get the salting treatment from skew.py. Durations are integer
    microseconds — no float anywhere.
    """
    ev = (
        load_tables(spark, sf_dir, names=("events",))["events"]
        .filter(F.col("user_id") % 20 == 0)
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(gap_us.isNull() | (gap_us > 1800 * 1_000_000), 1).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sessions = (
        ev.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(cum).cast("bigint"))
        .groupBy("user_id", "session_id")
        .agg(
            F.min(F.unix_micros("ts")).alias("start_us"),
            F.max(F.unix_micros("ts")).alias("end_us"),
        )
    )
    hour = 3600 * 1_000_000
    bucketed = sessions.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                (F.col("start_us") / hour).cast("bigint"),
                (F.col("end_us") / hour).cast("bigint"),
            )
        ),
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.start_us") < F.col("b.end_us"))
            & (F.col("b.start_us") < F.col("a.end_us")),
        )
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("a.session_id").alias("session_a"),
            F.col("b.user_id").alias("user_b"),
            F.col("b.session_id").alias("session_b"),
            (
                F.least(F.col("a.end_us"), F.col("b.end_us"))
                - F.greatest(F.col("a.start_us"), F.col("b.start_us"))
            ).alias("overlap_us"),
        )
        .dropDuplicates(["user_a", "session_a", "user_b", "session_b"])
    )
    return pairs.orderBy(
        F.desc("overlap_us"), "user_a", "session_a", "user_b", "session_b"
    ).limit(15)


@register(
    "join_null_safe",
    oracle="""
    WITH lhs AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0 THEN NULL
                  ELSE c_nationkey % 5 END AS grp
      FROM customer
    ), dim AS (
      SELECT * FROM (VALUES (0, 'bucket_0'), (1, 'bucket_1'), (2, 'bucket_2'),
                            (3, 'bucket_3'), (4, 'bucket_4'),
                            (CAST(NULL AS INTEGER), 'unknown')) t(grp, label)
    )
    SELECT d.label AS label, COUNT(*) AS n_customers
    FROM lhs l JOIN dim d ON l.grp IS NOT DISTINCT FROM d.grp
    GROUP BY d.label
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys match
    the dimension's designated NULL row instead of silently dropping —
    the 'unknown bucket' pattern for dirty foreign keys. Spark still
    plans <=> as a hash-joinable equi-condition (null-safe equality is a
    valid hash key where NULL hashes like a value), so this stays a
    broadcast hash join, NOT a cartesian-with-filter — the trap naive
    NULL-handling rewrites (OR (l IS NULL AND r IS NULL)) fall into."""
    cust = load_tables(spark, sf_dir, names=("customer",))["customer"]
    lhs = cust.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("c_nationkey") % 5)
        .cast("int")
        .alias("grp"),
    )
    dim = spark.createDataFrame(
        [(0, "bucket_0"), (1, "bucket_1"), (2, "bucket_2"),
         (3, "bucket_3"), (4, "bucket_4"), (None, "unknown")],
        "grp int, label string",
    )
    return (
        lhs.join(F.broadcast(dim), lhs["grp"].eqNullSafe(dim["grp"]))
        .groupBy("label")
        .agg(F.count("*").alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi-join reduction
# ---------------------------------------------------------------------------

_BLOOM_BITS = 1 << 16  # 64 Kbit -> 1024 longs; FPR ~1e-3 at ~4k keys, k=3
_BLOOM_WORDS = _BLOOM_BITS // 64
_BLOOM_SEEDS = (42, 43, 44)


@register(
    "join_bloom_filter_pruned",
    oracle="""
    SELECT l.l_returnflag,
           COUNT(*) AS n_items,
           CAST((SUM((CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                      * (100 - CAST(FLOOR(l.l_discount * 100 + 0.5) AS BIGINT))))
                 + 50) // 100 AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F' AND o.o_totalprice > 150000.0
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def join_bloom_filter_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim join with an explicit Bloom-filter pre-prune of the fact
    side — the semi-join reduction that saves the shuffle I/O when the dim
    predicate is selective but the surviving key set is too big to
    broadcast as a literal IN-list.

    Mechanics: the qualifying order keys hash k=3 ways (xxhash64 with
    distinct seeds) into a 64 Kbit bitmap, built DISTRIBUTEDLY as 1024
    OR-aggregated longs (one shuffle of ≤1024 rows); the bitmap — fixed
    4 KiB regardless of data scale — is collected and re-broadcast as a
    literal array expression, and lineitem rows whose l_orderkey misses
    any of the 3 bits are dropped BEFORE the join shuffle. No false
    negatives (Bloom guarantee), so the join result — and hence the
    oracle, which is the plain join — is exact; false positives are
    eliminated by the join itself.

    This is a hand-rolled twin of Spark's runtime row-group/bloom
    injection (spark.sql.optimizer.runtime.bloomFilter.enabled) in
    explicit-operator form, so the plan works on engines/builds where the
    optimizer rule is off and its size thresholds can be tuned per-query.
    At 100 TB the collected bitmap stays 4 KiB (scale-invariant driver
    traffic); size m up for the key cardinality to hold the FPR.
    """
    t = load_tables(spark, sf_dir, names=("orders", "lineitem"))
    dim = t["orders"].where(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000.0)
    )

    def positions(key: F.Column) -> list[F.Column]:
        return [
            F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(_BLOOM_BITS))
            for seed in _BLOOM_SEEDS
        ]

    # build: (word_idx, OR of masks) — distributed, 1024-row shuffle
    pos = F.explode(F.array(*positions(F.col("o_orderkey")))).alias("pos")
    words = (
        dim.select(pos)
        .select(
            F.floor(F.col("pos") / 64).cast("int").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    bitmap = [0] * _BLOOM_WORDS
    for r in words:
        bitmap[r["w"]] = r["bits"]
    # ONE parsed expression, not 1024 py4j lit().cast() round trips: the
    # column-by-column spelling cost ~2.7 s of pure driver time per call
    # (measured, r13 opt round) against ~4 ms for the parsed literal.
    lit_bitmap = F.expr("array(" + ",".join(f"{b}L" for b in bitmap) + ")")

    li = t["lineitem"].withColumn("_bm", lit_bitmap)
    for i, p in enumerate(positions(F.col("l_orderkey"))):
        li = li.withColumn(f"_p{i}", p)
    tests = [
        f"(element_at(_bm, CAST(FLOOR(_p{i} / 64) AS INT) + 1)"
        f" & shiftleft(CAST(1 AS BIGINT), CAST(_p{i} % 64 AS INT))) != 0"
        for i in range(len(_BLOOM_SEEDS))
    ]
    pruned = li.where(F.expr(" AND ".join(tests))).drop(
        "_bm", *[f"_p{i}" for i in range(len(_BLOOM_SEEDS))]
    )

    return (
        pruned.join(dim.select("o_orderkey"), pruned.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            # exact BIGINT 1e-4 revenue units, half-up to cents by integer
            # division (div, not '/': float division loses exactness past
            # 2^53) — the FLOOR(float-sum*100+0.5) form was the same
            # half-cent knife edge the r6 sweep removed elsewhere
            F.expr(
                "CAST((sum((CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)"
                " * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)))) + 50)"
                " div 100 AS BIGINT)"
            ).alias("revenue_cents"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH marked AS (
      SELECT event_id, user_id, ts, event_type,
             MAX(CASE WHEN event_type = 'error' THEN EPOCH_US(ts) END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_err_us,
             MIN(CASE WHEN event_type = 'error' THEN EPOCH_US(ts) END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_err_us
      FROM events
    ), picked AS (
      SELECT event_id, user_id,
             EPOCH_US(ts) - prev_err_us AS back_gap_us,
             next_err_us - EPOCH_US(ts) AS fwd_gap_us
      FROM marked WHERE event_type = 'purchase'
    )
    SELECT event_id, user_id,
           CASE
             WHEN back_gap_us IS NOT NULL
              AND (fwd_gap_us IS NULL OR back_gap_us <= fwd_gap_us)
              AND back_gap_us <= 3600000000 THEN 'before'
             WHEN fwd_gap_us IS NOT NULL
              AND fwd_gap_us <= 3600000000 THEN 'after'
             ELSE 'none'
           END AS nearest_side,
           CASE
             WHEN back_gap_us IS NOT NULL
              AND (fwd_gap_us IS NULL OR back_gap_us <= fwd_gap_us)
              AND back_gap_us <= 3600000000 THEN back_gap_us // 1000000
             WHEN fwd_gap_us IS NOT NULL
              AND fwd_gap_us <= 3600000000 THEN fwd_gap_us // 1000000
           END AS gap_seconds
    FROM picked
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-neighbor temporal alignment: each purchase is matched to the
    closest same-account error event in EITHER direction within 1 h —
    backward-only is join_asof; sensor fusion, incident correlation and
    label alignment all need the two-sided nearest variant, ties resolved
    toward the earlier (backward) event.

    No join at all: both candidate timestamps ride ONE user_id window
    pass (prefix MAX of error micros behind, suffix MIN ahead — the
    IGNORE NULLS-free carry used throughout this repo), and the pick is
    a projection. One shuffle on user_id, total, regardless of how many
    right-side events exist — the join formulation would shuffle both
    sides and need a per-row argmin aggregate on top.
    """
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    err_us = F.when(F.col("event_type") == "error", F.unix_micros("ts"))
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    marked = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.max(err_us).over(w_back).alias("prev_err_us"),
        F.min(err_us).over(w_fwd).alias("next_err_us"),
    ).where(F.col("event_type") == "purchase")
    back_gap = F.unix_micros("ts") - F.col("prev_err_us")
    fwd_gap = F.col("next_err_us") - F.unix_micros("ts")
    hour_us = 3_600_000_000
    pick_back = back_gap.isNotNull() & (
        F.col("next_err_us").isNull() | (back_gap <= fwd_gap)
    ) & (back_gap <= hour_us)
    pick_fwd = fwd_gap.isNotNull() & (fwd_gap <= hour_us)
    return marked.select(
        "event_id",
        "user_id",
        F.when(pick_back, "before")
        .when(pick_fwd, "after")
        .otherwise("none")
        .alias("nearest_side"),
        F.when(pick_back, F.floor(back_gap / 1_000_000).cast("bigint"))
        .when(pick_fwd, F.floor(fwd_gap / 1_000_000).cast("bigint"))
        .alias("gap_seconds"),
    )


@register(
    "join_asof_tolerance",
    oracle="""
    WITH pairs AS (
      SELECT e.event_id, e.user_id, e.ts AS error_ts,
             p.ts AS purchase_ts, p.value AS purchase_value,
             ROW_NUMBER() OVER (PARTITION BY e.event_id
                                ORDER BY p.ts DESC, p.event_id DESC) AS rn
      FROM events e
      JOIN events p
        ON p.user_id = e.user_id
       AND p.event_type = 'purchase'
       AND p.ts <= e.ts
       AND p.ts >= e.ts - INTERVAL 6 HOURS
      WHERE e.event_type = 'error'
    )
    SELECT event_id, user_id, error_ts, purchase_ts,
           ROUND(purchase_value, 2) AS purchase_value
    FROM pairs WHERE rn = 1
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH TOLERANCE (pandas merge_asof's `tolerance`
    parameter as a distributed join): each error event matches its most
    recent prior purchase ONLY if it happened within the last 6 hours —
    a stale match is semantically no match (the attribution/session bound
    every real as-of lookup needs; join_asof is the unbounded twin).

    The tolerance predicate joins INSIDE the range condition, so the
    pre-rank pair fan-out shrinks to the window width — at 100 TB the
    bound is also what makes the as-of join state FINITE (its streaming
    analogue is exactly a watermark). Same plan family as join_asof: an
    equi-join on the key with the range predicate, per-left-row top-1 by
    event time, never a cartesian."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("error_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_event_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    from pyspark.sql import Window
    joined = errors.join(
        purchases,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("purchase_ts") <= F.col("error_ts"))
        & (F.col("purchase_ts") >= F.col("error_ts") - F.expr("INTERVAL 6 HOURS")),
    )
    w = Window.partitionBy("event_id").orderBy(
        F.desc("purchase_ts"), F.desc("p_event_id")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "error_ts",
            "purchase_ts",
            F.round("purchase_value", 2).alias("purchase_value"),
        )
    )
