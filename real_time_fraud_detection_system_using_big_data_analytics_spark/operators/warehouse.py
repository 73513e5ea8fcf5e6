"""Warehouse-maintenance operators: incremental aggregate merge, one-pass
table profiling, rolling distinct counts.

The reference recomputes everything from scratch on every run (to_sql.py
drops and reloads; fraud_detection_model.py re-reads the full CSV per
metric). At 100 TB that posture is untenable: a day's delta is ~0.1% of the
table, so the engine needs the *algebraic* forms — aggregate states that
merge (count/sum/min/max are semigroups; avg derives from (sum, count)) so
a materialized rollup is maintained by touching only the delta partition.

Scale posture:
- `etl_incremental_agg_merge` is the maintenance kernel: partial states are
  one row per group per segment, so the merge shuffles |groups|×|segments|
  rows, never the fact table. On a real lake the base state is a stored
  table and only the delta scan runs per refresh;
- `profile_column_stats` computes every column's profile in ONE scan
  (count/nulls/distinct/min/max fused into a single aggregate, then pivoted
  long). Exact ndv via multiple COUNT(DISTINCT) is the oracle-checkable
  form; at 100 TB swap in approx_count_distinct — same plan shape without
  the expand;
- `window_rolling_distinct_users` uses the explode-contribution trick:
  rolling COUNT(DISTINCT) is not window-decomposable, but each (day, user)
  pair contributes to exactly W target days, so a W-way in-row explode of
  the *deduplicated* daily pairs turns it into a plain groupBy — shuffle
  volume W×|daily pairs|, independent of raw event count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_tables

_CUTOFF = "2000-01-01"


@register(
    "etl_incremental_agg_merge",
    oracle=f"""
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           FLOOR(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                 / COUNT(*) + 0.5) / 100.0 AS avg_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def etl_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance: the per-priority
    rollup is built as BASE (orders before {_CUTOFF}, standing in for the
    stored aggregate state) merged with DELTA (orders on/after it, the new
    partition) — and the merged result must be value-identical to a full
    recompute, which is exactly what the oracle runs. States are
    (count, cent-sum): both semigroup-mergeable with integer arithmetic,
    and avg is derived AFTER the merge (averages don't merge; sums do —
    the classic incremental-view-maintenance correctness trap)."""
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    cents = F.round(F.col("o_totalprice") * 100).cast("long")

    def partial(seg: DataFrame) -> DataFrame:
        return seg.groupBy(F.col("o_orderpriority").alias("priority")).agg(
            F.count("*").alias("n_orders"),
            F.sum(cents).alias("total_cents"),
        )

    cutoff = F.lit(_CUTOFF).cast("timestamp_ntz")
    base = partial(orders.filter(F.col("o_orderdate") < cutoff))
    # the delta is the exact COMPLEMENT of the base, NULL dates included —
    # two filters that both reject NULL would silently drop such rows from
    # both segments and break the base+delta == full-recompute identity
    delta = partial(
        orders.filter(
            (F.col("o_orderdate") >= cutoff) | F.col("o_orderdate").isNull()
        )
    )
    merged = (
        base.unionAll(delta)
        .groupBy("priority")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("total_cents").cast("long").alias("total_cents"),
        )
    )
    return merged.select(
        "priority",
        "n_orders",
        "total_cents",
        (
            F.floor(F.col("total_cents").cast("double") / F.col("n_orders") + 0.5)
            / 100.0
        ).alias("avg_price"),
    )


@register(
    "profile_column_stats",
    oracle="""
    WITH s AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(*) - COUNT(o_orderstatus)   AS nulls_status,
             COUNT(DISTINCT o_orderstatus)     AS ndv_status,
             MIN(o_orderstatus)                AS min_status,
             MAX(o_orderstatus)                AS max_status,
             COUNT(*) - COUNT(o_orderpriority) AS nulls_prio,
             COUNT(DISTINCT o_orderpriority)   AS ndv_prio,
             MIN(o_orderpriority)              AS min_prio,
             MAX(o_orderpriority)              AS max_prio,
             COUNT(*) - COUNT(o_custkey)       AS nulls_cust,
             COUNT(DISTINCT o_custkey)         AS ndv_cust,
             MIN(o_custkey)                    AS min_cust,
             MAX(o_custkey)                    AS max_cust,
             COUNT(*) - COUNT(o_totalprice)    AS nulls_price,
             COUNT(DISTINCT o_totalprice)      AS ndv_price,
             MIN(o_totalprice)                 AS min_price,
             MAX(o_totalprice)                 AS max_price
      FROM orders
    )
    SELECT 'o_orderstatus' AS column_name, n_rows,
           CAST(nulls_status AS BIGINT) AS n_nulls,
           CAST(ndv_status AS BIGINT) AS n_distinct,
           min_status AS min_str, max_status AS max_str,
           CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num
    FROM s
    UNION ALL
    SELECT 'o_orderpriority', n_rows, CAST(nulls_prio AS BIGINT),
           CAST(ndv_prio AS BIGINT), min_prio, max_prio,
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
    FROM s
    UNION ALL
    SELECT 'o_custkey', n_rows, CAST(nulls_cust AS BIGINT),
           CAST(ndv_cust AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(min_cust AS DOUBLE),
           CAST(max_cust AS DOUBLE)
    FROM s
    UNION ALL
    SELECT 'o_totalprice', n_rows, CAST(nulls_price AS BIGINT),
           CAST(ndv_price AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), ROUND(min_price, 2), ROUND(max_price, 2)
    FROM s
    """,
)
def profile_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling pass: per-column row count, null count, exact
    distinct count, and min/max — for all four profiled columns in ONE
    scan of the table (one wide aggregate, pivoted long with an in-row
    explode; the multiple exact COUNT(DISTINCT)s compile to Catalyst's
    expand operator). String and numeric extrema travel in separate typed
    columns — stringifying a double is engine-specific formatting, so it
    never crosses the oracle boundary. At 100 TB the same plan runs with
    approx_count_distinct and no expand; this exact form is the
    profiler's oracle twin."""
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    n = F.count("*")
    wide = orders.agg(
        n.alias("n_rows"),
        (n - F.count("o_orderstatus")).alias("nulls_status"),
        F.countDistinct("o_orderstatus").alias("ndv_status"),
        F.min("o_orderstatus").alias("min_status"),
        F.max("o_orderstatus").alias("max_status"),
        (n - F.count("o_orderpriority")).alias("nulls_prio"),
        F.countDistinct("o_orderpriority").alias("ndv_prio"),
        F.min("o_orderpriority").alias("min_prio"),
        F.max("o_orderpriority").alias("max_prio"),
        (n - F.count("o_custkey")).alias("nulls_cust"),
        F.countDistinct("o_custkey").alias("ndv_cust"),
        F.min("o_custkey").alias("min_cust"),
        F.max("o_custkey").alias("max_cust"),
        (n - F.count("o_totalprice")).alias("nulls_price"),
        F.countDistinct("o_totalprice").alias("ndv_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )
    null_s = F.lit(None).cast("string")
    null_d = F.lit(None).cast("double")
    rows = F.array(
        F.struct(
            F.lit("o_orderstatus").alias("column_name"),
            F.col("nulls_status").alias("n_nulls"),
            F.col("ndv_status").alias("n_distinct"),
            F.col("min_status").alias("min_str"),
            F.col("max_status").alias("max_str"),
            null_d.alias("min_num"),
            null_d.alias("max_num"),
        ),
        F.struct(
            F.lit("o_orderpriority").alias("column_name"),
            F.col("nulls_prio").alias("n_nulls"),
            F.col("ndv_prio").alias("n_distinct"),
            F.col("min_prio").alias("min_str"),
            F.col("max_prio").alias("max_str"),
            null_d.alias("min_num"),
            null_d.alias("max_num"),
        ),
        F.struct(
            F.lit("o_custkey").alias("column_name"),
            F.col("nulls_cust").alias("n_nulls"),
            F.col("ndv_cust").alias("n_distinct"),
            null_s.alias("min_str"),
            null_s.alias("max_str"),
            F.col("min_cust").cast("double").alias("min_num"),
            F.col("max_cust").cast("double").alias("max_num"),
        ),
        F.struct(
            F.lit("o_totalprice").alias("column_name"),
            F.col("nulls_price").alias("n_nulls"),
            F.col("ndv_price").alias("n_distinct"),
            null_s.alias("min_str"),
            null_s.alias("max_str"),
            F.round("min_price", 2).alias("min_num"),
            F.round("max_price", 2).alias("max_num"),
        ),
    )
    return (
        wide.select("n_rows", F.explode(rows).alias("p"))
        .select(
            F.col("p.column_name").alias("column_name"),
            "n_rows",
            F.col("p.n_nulls").alias("n_nulls"),
            F.col("p.n_distinct").alias("n_distinct"),
            F.col("p.min_str").alias("min_str"),
            F.col("p.max_str").alias("max_str"),
            F.col("p.min_num").alias("min_num"),
            F.col("p.max_num").alias("max_num"),
        )
    )


_WINDOW_DAYS = 7


@register(
    "window_rolling_distinct_users",
    oracle=f"""
    WITH daily AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ), days AS (
      SELECT DISTINCT d FROM daily
    ), contrib AS (
      SELECT daily.d + g.i AS target_day, daily.user_id
      FROM daily CROSS JOIN (
        SELECT CAST(range AS INTEGER) AS i
        FROM range(0, {_WINDOW_DAYS})
      ) g
    )
    SELECT c.target_day AS day,
           CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS active_users_7d
    FROM contrib c
    JOIN days ON days.d = c.target_day
    GROUP BY c.target_day
    """,
)
def window_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day. COUNT(DISTINCT) over
    a sliding window is not algebraically decomposable (window frames
    can't merge distinct sets), so the rolling form is rebuilt as a plain
    groupBy via the explode-contribution identity: user u active on day d
    is counted in the windows of days d..d+6, so each *deduplicated*
    (day, user) pair explodes to its 7 target days and the rolling
    distinct is an ordinary per-target-day COUNT(DISTINCT). Days with no
    events emit no row (semi-join with the observed-day set) — matching
    the window definition, not a gap-filled calendar. Shuffle volume is
    7×|daily pairs| — already collapsed from raw events by the first
    distinct — so the plan scales with active-user-days, not event
    volume."""
    events = load_tables(spark, sf_dir, names=("events",))["events"]
    daily = events.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    days = daily.select("d").distinct().withColumnRenamed("d", "target_day")
    contrib = daily.select(
        F.explode(
            F.sequence(
                F.col("d"),
                F.date_add(F.col("d"), _WINDOW_DAYS - 1),
            )
        ).alias("target_day"),
        "user_id",
    )
    return (
        contrib.join(days, "target_day", "left_semi")
        .groupBy(F.col("target_day").alias("day"))
        .agg(F.countDistinct("user_id").alias("active_users_7d"))
    )


@register(
    "etl_join_ivm_delta",
    oracle="""
    SELECT o.o_custkey AS custkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_custkey
    """,
)
def etl_join_ivm_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of a JOIN view — the delta algebra
    behind streaming materialized views: with both inputs split into base
    and delta (O = Ob∪δO, L = Lb∪δL), the view delta is the three cross
    terms  Ob⋈δL ∪ δO⋈Lb ∪ δO⋈δL,  and base state Ob⋈Lb is never
    recomputed. This operator maintains a per-customer revenue rollup that
    way and must equal the oracle's full-recompute join — the IVM
    correctness identity itself is the value check (the companion to
    etl_incremental_agg_merge, which covers the aggregate-only case).

    Each cross term joins a DELTA side (orderkey-suffix slice, ~10-14% of
    rows) against a base table, so maintenance work scales with |δ|, not
    |base⋈base|; the delta sides carry explicit broadcast hints (deltas
    are small by definition — that's the IVM contract), the partial
    states are (count, cent-sum) semigroups merged AFTER the union, and
    the average-style derivations would happen post-merge as in the agg
    twin. Disjointness of the four terms is guaranteed by the
    partition-complement split (modulus on the join key itself), so no
    double counting is possible."""
    t = load_tables(spark, sf_dir, names=("orders", "lineitem"))
    orders, lineitem = t["orders"], t["lineitem"]
    o_delta_pred = (F.col("o_orderkey") % 10) == 0
    l_delta_pred = (F.col("l_orderkey") % 7) == 0
    ob, od = orders.filter(~o_delta_pred), orders.filter(o_delta_pred)
    lb, ld = lineitem.filter(~l_delta_pred), lineitem.filter(l_delta_pred)
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")

    def partial(o: DataFrame, l: DataFrame) -> DataFrame:
        return (
            o.join(l, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy(F.col("o_custkey").alias("custkey"))
            .agg(
                F.count("*").alias("n_items"),
                F.sum(cents).alias("revenue_cents"),
            )
        )

    base_state = partial(ob, lb)          # stored view state (Ob⋈Lb)
    d1 = partial(ob, F.broadcast(ld))     # Ob ⋈ δL
    d2 = partial(F.broadcast(od), lb)     # δO ⋈ Lb
    d3 = partial(F.broadcast(od), ld)     # δO ⋈ δL
    return (
        base_state.unionAll(d1)
        .unionAll(d2)
        .unionAll(d3)
        .groupBy("custkey")
        .agg(
            F.sum("n_items").cast("bigint").alias("n_items"),
            F.sum("revenue_cents").cast("bigint").alias("revenue_cents"),
        )
    )


@register(
    "dq_freshness_by_source",
    oracle="""
    WITH per_type AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             MAX(ts) AS latest_ts
      FROM events GROUP BY event_type
    ), gmax AS (SELECT MAX(latest_ts) AS global_latest FROM per_type)
    SELECT p.event_type, p.n_events, p.latest_ts,
           CAST(FLOOR((epoch_us(g.global_latest) - epoch_us(p.latest_ts))
                      / 1000000.0) AS BIGINT) AS lag_s,
           CAST(FLOOR((epoch_us(g.global_latest) - epoch_us(p.latest_ts))
                      / 1000000.0) AS BIGINT) > 3600 AS stale
    FROM per_type p CROSS JOIN gmax g
    """,
)
def dq_freshness_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness monitor: per source (event type), the latest event
    time and its lag behind the freshest source, with a staleness flag at
    1 h — the first page of every pipeline-ops dashboard (a silent
    upstream outage shows up as one source's lag growing while the others
    advance). Lag is floor()ed integer seconds from epoch-microsecond
    arithmetic (the division-dialect trap fraud_interarrival_profile
    documents). One map-side-combinable aggregate at source cardinality +
    a 1-row broadcast; at 100 TB read the per-partition parquet footers
    (max statistics) instead of scanning — same output contract."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    per = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.max("ts").alias("latest_ts"),
    )
    glob = per.agg(F.max("latest_ts").alias("global_latest"))
    lag = F.floor(
        (F.unix_micros("global_latest") - F.unix_micros("latest_ts")) / 1_000_000.0
    ).cast("bigint")
    return (
        per.crossJoin(F.broadcast(glob))
        .select(
            "event_type",
            "n_events",
            "latest_ts",
            lag.alias("lag_s"),
            (lag > 3600).alias("stale"),
        )
    )


@register(
    "dq_partition_skew_report",
    oracle="""
    WITH per_key AS (
      SELECT l_suppkey AS part_key, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem GROUP BY l_suppkey
    ), stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(n_rows) AS BIGINT) AS total_rows,
             CAST(MAX(n_rows) AS BIGINT) AS max_rows
      FROM per_key
    )
    SELECT s.n_keys, s.total_rows, s.max_rows,
           CAST(FLOOR(s.max_rows * s.n_keys * 1000000.0 / s.total_rows + 0.5)
                AS BIGINT) AS skew_factor_micro,
           s.max_rows * s.n_keys > 5 * s.total_rows AS skewed,
           (SELECT COUNT(*) FROM per_key p, stats s2
            WHERE p.n_rows * s2.n_keys > 2 * s2.total_rows) AS n_hot_keys
    FROM stats s
    """,
)
def dq_partition_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew report for a prospective join/aggregation key:
    max-partition/mean-partition ratio (the AQE skew-join trigger
    quantity) plus the count of hot keys exceeding 2× the mean — the
    diagnostic you run BEFORE choosing salting (operators/skew.py) or
    relying on AQE. All comparisons integer cross-multiplied (n·keys vs
    k·total), the reported factor floor-quantized once. One aggregate at
    key cardinality; the report itself is O(1) rows."""
    li = load_tables(spark, sf_dir, names=("lineitem",))["lineitem"]
    per_key = li.groupBy(F.col("l_suppkey").alias("part_key")).agg(
        F.count("*").cast("bigint").alias("n_rows")
    )
    stats = per_key.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("n_rows").cast("bigint").alias("total_rows"),
        F.max("n_rows").cast("bigint").alias("max_rows"),
    )
    hot = (
        per_key.crossJoin(F.broadcast(stats))
        .where(F.col("n_rows") * F.col("n_keys") > 2 * F.col("total_rows"))
        .agg(F.count("*").alias("n_hot_keys"))
    )
    return (
        stats.crossJoin(F.broadcast(hot))
        .select(
            "n_keys",
            "total_rows",
            "max_rows",
            F.floor(
                F.col("max_rows") * F.col("n_keys") * 1_000_000.0
                / F.col("total_rows")
                + 0.5
            )
            .cast("bigint")
            .alias("skew_factor_micro"),
            (F.col("max_rows") * F.col("n_keys") > 5 * F.col("total_rows")).alias(
                "skewed"
            ),
            "n_hot_keys",
        )
    )


@register(
    "dq_referential_orphans",
    oracle="""
    SELECT 'orders->customer' AS fk_edge,
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
             AS n_orphans,
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_rows
    UNION ALL
    SELECT 'lineitem->orders',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'lineitem->part',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey)) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'lineitem->supplier',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                   WHERE s.s_suppkey = l.l_suppkey)) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'customer->nation',
           CAST((SELECT COUNT(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT),
           CAST((SELECT COUNT(*) FROM customer) AS BIGINT)
    """,
)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity census across the star schema's five FK
    edges: orphan counts via LEFT ANTI joins (rows whose FK target is
    missing) next to each table's row count — the ingest-gate check that
    catches a partial dimension load before it silently drops fact rows
    from every inner join downstream (the WAP audit's cross-table
    companion; dq_audit_rules covers single-table nulls/ranges).

    Each edge is one anti join against the DIMENSION side — broadcast
    where the dimension is small (customer/nation/part/supplier), shuffle
    otherwise — then a count; the five 1-row results union in-plan. The
    fact table scans read ONLY the FK column (ReadSchema-pruned)."""
    t = load_tables(
        spark, sf_dir,
        names=("orders", "customer", "lineitem", "part", "supplier", "nation"),
    )

    def edge(name: str, fact: DataFrame, fk: str, dim: DataFrame, pk: str) -> DataFrame:
        orphans = fact.select(F.col(fk)).join(
            dim.select(F.col(pk)), fact[fk] == dim[pk], "left_anti"
        )
        return (
            orphans.agg(F.count("*").cast("bigint").alias("n_orphans"))
            .crossJoin(
                fact.agg(F.count("*").cast("bigint").alias("n_rows"))
            )
            .select(F.lit(name).alias("fk_edge"), "n_orphans", "n_rows")
        )

    return (
        edge("orders->customer", t["orders"], "o_custkey", t["customer"], "c_custkey")
        .unionByName(
            edge("lineitem->orders", t["lineitem"], "l_orderkey", t["orders"], "o_orderkey")
        )
        .unionByName(
            edge("lineitem->part", t["lineitem"], "l_partkey", t["part"], "p_partkey")
        )
        .unionByName(
            edge("lineitem->supplier", t["lineitem"], "l_suppkey", t["supplier"], "s_suppkey")
        )
        .unionByName(
            edge("customer->nation", t["customer"], "c_nationkey", t["nation"], "n_nationkey")
        )
    )


@register(
    "etl_idempotent_reload",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM events GROUP BY event_type
    """,
)
def etl_idempotent_reload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent-reload proof: the SAME source batch ingested TWICE
    (union of two full reads — the at-least-once delivery every retrying
    loader produces) must yield byte-identical aggregates to a single
    clean load after key-dedup. The engine deliberately doubles the
    input, dedups on the natural key (row_number-free dropDuplicates —
    rows are exact replicas, so no version ordering is needed), and
    aggregates; the oracle is the single-copy truth. This is the
    correctness contract behind exactly-once SINKS built on at-least-once
    SOURCES (stream_exactly_once_filesink is the streaming face of the
    same invariant).

    Dedup on the key is one shuffle; the doubled scan is two reads of
    the same files — at 100 TB the real loader dedups per-batch against
    a key index instead, but the invariant tested here is unchanged."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    doubled = ev.unionByName(ev)
    deduped = doubled.dropDuplicates(["event_id"])
    return deduped.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("total_cents"),
    )


@register(
    "dq_volume_anomaly_dod",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    trail AS (
      SELECT day, n,
             CAST(COUNT(*) OVER w AS BIGINT) AS n_prior_days,
             CAST(SUM(n) OVER w AS BIGINT) AS sum_prior
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT day, n,
           CAST(FLOOR(sum_prior * 1.0 / n_prior_days + 0.5) AS BIGINT)
             AS trailing_avg,
           (n * n_prior_days > 2 * sum_prior
            OR 2 * n * n_prior_days < sum_prior) AS volume_anomaly
    FROM trail WHERE n_prior_days > 0
    """,
)
def dq_volume_anomaly_dod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-volume anomaly gate: per-day event counts screened against
    the trailing-7-day average — a day is anomalous when it runs >2× or
    <0.5× its own recent history (the pipeline-health check that catches
    a dead producer or a double-delivery storm BEFORE the data ships
    downstream; the reference has no ingest monitoring at all). The
    comparisons are integer cross-multiplied (n·days vs 2·Σprior), so no
    float boundary; the displayed trailing average is floor-rounded only
    for the report column.

    Shape: the fact table collapses to one row per day in a map-side-
    combinable aggregate; the trailing frame runs on the ~30-row daily
    relation — a single-partition window over date-collapsed data, the
    standard telemetry pattern (window cost is days, not events)."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = Window.orderBy("day").rowsBetween(-7, -1)
    trail = daily.select(
        "day",
        "n",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_prior_days"),
        F.sum("n").over(w).cast("bigint").alias("sum_prior"),
    ).filter(F.col("n_prior_days") > 0)
    return trail.select(
        "day",
        "n",
        F.floor(F.col("sum_prior") / F.col("n_prior_days") + 0.5)
        .cast("bigint")
        .alias("trailing_avg"),
        (
            (F.col("n") * F.col("n_prior_days") > 2 * F.col("sum_prior"))
            | (2 * F.col("n") * F.col("n_prior_days") < F.col("sum_prior"))
        ).alias("volume_anomaly"),
    )
