"""Event-flow analytics: ordered funnel conversion, cohort retention,
per-entity mode. The event-log cousins of the reference's per-run
aggregate stats (spark_streaming_app.py:201-232 keeps totals/fraud-rate in
a driver dict) — here they are single declarative plans over the events
table, so they distribute instead of accumulating on the driver.

Scale posture:
- the funnel is ONE shuffle on user_id: ordered-prefix window minimums
  feed a per-user aggregate out of the same sort (no self-joins, which the
  naive 3-stage formulation would need);
- cohort retention shuffles the distinct (user, day) activity set and the
  first-seen aggregate on the same user_id key, so the join co-locates;
  cohort sizes come from a window over the tiny per-cohort result, not a
  second pass over the fact table;
- mode is groupBy + row_number over the (key, value) count table —
  cardinality is keys × distinct values, far below the event count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_tables


@register(
    "funnel_conversion",
    oracle="""
    WITH w1 AS (
      SELECT user_id, event_id, ts, event_type,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS r1
      FROM events
    ), w2 AS (
      SELECT user_id, event_id, ts, event_type, r1,
             MIN(CASE WHEN event_type = 'click' AND ts > r1 THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS r2
      FROM w1
    ), per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1,
             MIN(CASE WHEN event_type = 'click' AND ts > r1 THEN ts END) AS t2,
             MIN(CASE WHEN event_type = 'purchase' AND ts > r2 THEN ts END) AS t3
      FROM w2 GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           CAST(SUM(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
           CAST(SUM(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
    FROM per_user
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): how many users performed
    the three steps in strict temporal order. Formulated as running-prefix
    window minimums — "earliest view so far", then "earliest click after
    that view" — so the whole funnel is one shuffle + one sort per user,
    instead of the naive chain of three self-joins. The second window runs
    over a column derived from the first, but both share the same
    partitioning/ordering, so Spark plans back-to-back Window nodes with
    no second exchange."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    step1 = F.when(F.col("event_type") == "view", F.col("ts"))
    staged = ev.withColumn("r1", F.min(step1).over(w))
    step2 = F.when(
        (F.col("event_type") == "click") & (F.col("ts") > F.col("r1")), F.col("ts")
    )
    staged = staged.withColumn("r2", F.min(step2).over(w))
    step3 = F.when(
        (F.col("event_type") == "purchase") & (F.col("ts") > F.col("r2")), F.col("ts")
    )
    per_user = staged.groupBy("user_id").agg(
        F.min(step1).alias("t1"),
        F.min(step2).alias("t2"),
        F.min(step3).alias("t3"),
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.sum(F.col("t1").isNotNull().cast("bigint")).alias("n_view"),
        F.sum(F.col("t2").isNotNull().cast("bigint")).alias("n_view_click"),
        F.sum(F.col("t3").isNotNull().cast("bigint")).alias("n_full_funnel"),
    )


@register(
    "cohort_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), cells AS (
      SELECT CAST(weekofyear(f.first_day) AS INTEGER) AS cohort_week,
             CAST(FLOOR(datediff('day', f.first_day, a.day) / 7) AS BIGINT)
               AS week_offset,
             COUNT(DISTINCT a.user_id) AS n_active
      FROM activity a JOIN first_seen f USING (user_id)
      GROUP BY 1, 2
    )
    SELECT cohort_week, week_offset, n_active,
           FLOOR(100.0 * n_active
                 / MAX(CASE WHEN week_offset = 0 THEN n_active END)
                     OVER (PARTITION BY cohort_week) * 100.0 + 0.5) / 100.0
             AS retention_pct
    FROM cells
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen ISO week, then
    the share still active N weeks later. The activity set is distinct
    (user, day) pairs and joins the first-seen aggregate on the same
    user_id shuffle key, so the join co-locates. Cohort size is the
    offset-0 cell (every user is active on their first day by definition),
    read with a window over the tiny cohort×offset result instead of a
    second fact-table pass."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    activity = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    cells = (
        activity.join(first_seen, "user_id")
        .groupBy(
            F.weekofyear("first_day").alias("cohort_week"),
            F.floor(F.datediff(F.col("day"), F.col("first_day")) / 7).alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    size = F.max(F.when(F.col("week_offset") == 0, F.col("n_active"))).over(
        Window.partitionBy("cohort_week")
    )
    return cells.withColumn(
        "retention_pct",
        F.floor(100.0 * F.col("n_active") / size * 100.0 + 0.5) / 100.0,
    )


@register(
    "agg_mode_deterministic",
    oracle="""
    WITH counts AS (
      SELECT user_id, event_type, COUNT(*) AS cnt
      FROM events WHERE user_id < 100
      GROUP BY user_id, event_type
    ), ranked AS (
      SELECT user_id, event_type, cnt,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY cnt DESC, event_type) AS rn
      FROM counts
    )
    SELECT user_id, event_type AS top_event_type, cnt
    FROM ranked WHERE rn = 1
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-frequent value per key (mode) with a deterministic alphabetical
    tie-break — unlike the built-in ``mode()`` aggregate, whose tie winner
    is evaluation-order-dependent and therefore not reproducible across
    engines or partitionings. Count table is keys × distinct values (tiny
    vs. the fact table); row_number picks the winner on the same shuffle."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    counts = (
        ev.filter(F.col("user_id") < 100)
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("cnt"), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_event_type"), "cnt")
    )


@register(
    "eventflow_sequence_pattern",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_type,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3,
             LEAD(ts, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    matches AS (
      SELECT user_id, ts
      FROM seq
      WHERE event_type = 'view' AND e2 = 'click' AND e3 = 'purchase'
        AND t3 <= ts + INTERVAL 24 HOUR
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_matches,
           CAST(MIN(ts) AS TIMESTAMP) AS first_match_ts
    FROM matches GROUP BY user_id
    """,
)
def eventflow_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence detection in batch: per user, the
    strictly CONSECUTIVE pattern view → click → purchase (any intervening
    event — including 'error' — breaks the match) completing within 24
    hours of the opening view (the synthetic stream averages ~1 event per
    user-day, so a day-scale bound is the discriminating constraint an
    hour-scale one would vacuously fail). Contiguous-triple semantics via two LEADs
    over the (ts, event_id)-ordered per-user stream: deterministic,
    overlap-free to define, and exactly expressible on both engines —
    the batch twin of a CEP rule, without a state machine.

    One shuffle on user_id serves both LEAD window and the per-user
    aggregate (same partitioning, Catalyst reuses the exchange); at
    100 TB the pattern cost is the sort within each user partition,
    bounded by per-user event counts, with no self-join and no
    explosion."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
        F.lead("ts", 2).over(w).alias("t3"),
    )
    matches = seq.filter(
        (F.col("event_type") == "view")
        & (F.col("e2") == "click")
        & (F.col("e3") == "purchase")
        & (F.col("t3") <= F.col("ts") + F.expr("INTERVAL 24 HOURS"))
    )
    return matches.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_matches"),
        F.min("ts").alias("first_match_ts"),
    )


@register(
    "eventflow_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), pairs AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n_pair
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    ), margins AS (
      SELECT p.*, SUM(n_pair) OVER (PARTITION BY prev_type) AS n_prev
      FROM pairs p
    )
    SELECT prev_type, next_type, n_pair,
           CAST(FLOOR(n_pair * 1000000.0 / n_prev + 0.5) AS BIGINT)
             AS p_micro
    FROM margins
    ORDER BY prev_type, next_type
    """,
)
def eventflow_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types per account
    stream: P(next | prev) estimated from lagged pairs — the behavioral
    fingerprint used for sequence-anomaly scoring (a transition the
    matrix says is rare is a flag; the CEP twin is
    eventflow_sequence_pattern).

    One shuffle on user_id for the lag; the |types|² matrix aggregates
    map-side after that, and the row-marginal normalization is a window
    over the tiny matrix itself. Probabilities are exact integer
    micro-units (n_pair·1e6/n_prev), no float summation anywhere.
    """
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    pairs = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("n_pair")
    )
    n_prev = F.sum("n_pair").over(Window.partitionBy("prev_type"))
    return (
        pairs.withColumn(
            "p_micro",
            F.floor(F.col("n_pair") * 1_000_000.0 / n_prev + 0.5).cast("bigint"),
        )
        .orderBy("prev_type", "next_type")
    )


@register(
    "eventflow_time_to_convert",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view_us,
             MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_buy_us
      FROM events GROUP BY user_id
    ), latency AS (
      SELECT CAST(FLOOR((first_buy_us - first_view_us) / 1000000.0) AS BIGINT)
               AS ttc_s
      FROM firsts
      WHERE first_view_us IS NOT NULL AND first_buy_us IS NOT NULL
        AND first_buy_us >= first_view_us
    ), agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
             list_sort(list(ttc_s)) AS sorted_ttc,
             MAX(ttc_s) AS max_ttc_s
      FROM latency
    )
    SELECT n_converted,
           sorted_ttc[CAST(FLOOR((n_converted + 1) / 2.0) AS INTEGER)]
             AS median_ttc_s,
           sorted_ttc[CAST(FLOOR((n_converted * 9 + 9) / 10.0) AS INTEGER)]
             AS p90_ttc_s,
           max_ttc_s
    FROM agg
    """,
)
def eventflow_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion latency distribution: seconds from each user's FIRST
    view to their FIRST purchase (converted users only), reported as
    exact lower-median / lower-p90 / max — the funnel-velocity companion
    to funnel_conversion's rate (how MANY convert) and
    eventflow_sequence_pattern's path (in what ORDER): this is how FAST.

    The per-user firsts are two conditional MINs in one pass (no
    self-join, no window); latencies are floor()ed integer seconds;
    quantiles index into the sorted array (positions floor((n+1)/2) and
    floor((9n+9)/10) — the same interpolation-free discipline as
    fraud_interarrival_profile). The final collect_list holds one value
    per CONVERTED user — at 100 TB swap it for the two-pass exact
    quantile (count, then offset lookup) or the t-digest; the per-user
    stage is unchanged."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    us = F.unix_micros("ts")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("first_view_us"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("first_buy_us"),
    )
    latency = firsts.where(
        F.col("first_view_us").isNotNull()
        & F.col("first_buy_us").isNotNull()
        & (F.col("first_buy_us") >= F.col("first_view_us"))
    ).select(
        F.floor(
            (F.col("first_buy_us") - F.col("first_view_us")) / 1_000_000.0
        )
        .cast("bigint")
        .alias("ttc_s")
    )
    agg = latency.agg(
        F.count("*").cast("bigint").alias("n_converted"),
        F.sort_array(F.collect_list("ttc_s")).alias("sorted_ttc"),
        F.max("ttc_s").alias("max_ttc_s"),
    )
    return agg.select(
        "n_converted",
        F.element_at(
            F.col("sorted_ttc"),
            F.floor((F.col("n_converted") + 1) / 2.0).cast("int"),
        ).alias("median_ttc_s"),
        F.element_at(
            F.col("sorted_ttc"),
            F.floor((F.col("n_converted") * 9 + 9) / 10.0).cast("int"),
        ).alias("p90_ttc_s"),
        "max_ttc_s",
    )


@register(
    "eventflow_top_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER win AS e2,
             LEAD(event_type, 2) OVER win AS e3
      FROM events WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), paths AS (
      SELECT event_type || '>' || e2 || '>' || e3 AS path
      FROM seq WHERE e3 IS NOT NULL
    ), counted AS (
      SELECT path, CAST(COUNT(*) AS BIGINT) AS n FROM paths GROUP BY path
    ), total AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM counted)
    SELECT c.path, c.n,
           CAST(FLOOR(c.n * 1000000.0 / t.t + 0.5) AS BIGINT) AS share_micro
    FROM counted c CROSS JOIN total t
    ORDER BY c.n DESC, c.path
    LIMIT 10
    """,
)
def eventflow_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most-travelled 3-event paths across account streams — path
    mining, the sequence-level census that sits between the Markov matrix
    (pairwise transitions) and the CEP pattern matcher (one specific
    path): product analytics reads it as the dominant user journeys;
    fraud ops reads a NEW path surging into the top-10 as a script
    change. Paths are built joinlessly from two LEADs over the per-user
    order (the trigram trick applied to event streams), counted
    map-side-combinably, shared against the exact total, top-10 by
    TakeOrderedAndProject."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(win).alias("e2"),
        F.lead("event_type", 2).over(win).alias("e3"),
    ).where(F.col("e3").isNotNull())
    counted = (
        seq.select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    total = counted.agg(F.sum("n").cast("bigint").alias("t"))
    return (
        counted.crossJoin(F.broadcast(total))
        .select(
            "path",
            "n",
            F.floor(F.col("n") * 1_000_000.0 / F.col("t") + 0.5)
            .cast("bigint")
            .alias("share_micro"),
        )
        .orderBy(F.desc("n"), "path")
        .limit(10)
    )


@register(
    "eventflow_cep_negation",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, ts, event_type, value,
             MIN(CASE WHEN event_type = 'error' THEN ts END) OVER f AS next_error_ts,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) OVER f AS next_signup_ts
      FROM events
      WINDOW f AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, event_id AS purchase_id,
           CAST(ts AS TIMESTAMP) AS purchase_ts,
           CAST(next_error_ts AS TIMESTAMP) AS error_ts
    FROM seq
    WHERE event_type = 'purchase' AND value > 50.0
      AND next_error_ts IS NOT NULL
      AND next_error_ts <= ts + INTERVAL 60 MINUTE
      AND (next_signup_ts IS NULL OR next_signup_ts > next_error_ts)
    """,
)
def eventflow_cep_negation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP pattern with a NEGATION clause — the MATCH_RECOGNIZE shape
    `A ... B within T, with no C between` that contiguous-LEAD matching
    (eventflow_sequence_pattern) cannot express: a purchase over 50 followed
    by an error within 60 minutes where no 'signup' event intervenes
    (the negation genuinely rejects matches on this data)
    (skip-irrelevant-events semantics — any number of other events may sit
    between A and B).

    Joinless formulation: two conditional MINs over the strictly-FOLLOWING
    frame of the (ts, event_id)-ordered per-user stream give the next
    error and next signup after each event; the negation is then a plain
    comparison (no signup, or it lands after the matched error). This is
    the standard unnesting of a [^C]*B regex into first-occurrence
    algebra — no self-join, no state machine, no pair fan-out.

    One user_id shuffle serves both window functions (same frame spec,
    one Exchange + one sort); at 100 TB the cost is the per-user sort,
    and the post-window filter prunes to purchase rows only. The
    streaming twin would be the stream-stream interval join
    (stream_stream_join) plus a signup-absence anti-condition — this is
    the batch oracle such a rule would be verified against."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    f = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    seq = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "value",
        F.min(F.when(F.col("event_type") == "error", F.col("ts"))).over(f).alias(
            "next_error_ts"
        ),
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(f).alias(
            "next_signup_ts"
        ),
    )
    return seq.filter(
        (F.col("event_type") == "purchase")
        & (F.col("value") > 50.0)
        & F.col("next_error_ts").isNotNull()
        & (F.col("next_error_ts") <= F.col("ts") + F.expr("INTERVAL 60 MINUTES"))
        & (
            F.col("next_signup_ts").isNull()
            | (F.col("next_signup_ts") > F.col("next_error_ts"))
        )
    ).select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("next_error_ts").alias("error_ts"),
    )


@register(
    "eventflow_absorbing_conversion_prob",
    oracle="""
    WITH pairs AS (
      SELECT event_type AS a,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS b
      FROM events
    ), m AS (
      SELECT a, b,
             CAST(COUNT(*) * 1000000 // SUM(COUNT(*)) OVER (PARTITION BY a)
                  AS BIGINT) AS p_micro
      FROM pairs WHERE b IS NOT NULL GROUP BY a, b
    ), q1 AS (
      SELECT a, CAST(SUM(CASE WHEN b = 'purchase' THEN p_micro ELSE 0 END)
                 AS BIGINT) AS q
      FROM m GROUP BY a
    ), q2 AS (
      SELECT m.a,
             CAST(SUM(m.p_micro * (CASE WHEN m.b = 'purchase' THEN 1000000
                                        ELSE COALESCE(q1.q, 0) END))
                  // 1000000 AS BIGINT) AS q
      FROM m LEFT JOIN q1 ON q1.a = m.b
      GROUP BY m.a
    ), q3 AS (
      SELECT m.a,
             CAST(SUM(m.p_micro * (CASE WHEN m.b = 'purchase' THEN 1000000
                                        ELSE COALESCE(q2.q, 0) END))
                  // 1000000 AS BIGINT) AS q
      FROM m LEFT JOIN q2 ON q2.a = m.b
      GROUP BY m.a
    )
    SELECT q1.a AS event_type,
           q1.q AS p1_micro, q2.q AS p2_micro, q3.q AS p3_micro
    FROM q1 JOIN q2 ON q2.a = q1.a JOIN q3 ON q3.a = q1.a
    """,
)
def eventflow_absorbing_conversion_prob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absorbing-chain conversion probability: starting from each event
    type, the probability of hitting 'purchase' within 1, 2 and 3
    transitions under the empirical Markov matrix — the PREDICTIVE layer
    on top of eventflow_markov_transitions (which only reports the
    matrix). The recursion q_k(a) = Σ_b p(a,b)·[b = purchase ? 1 :
    q_{k-1}(b)] runs as k bounded joins of the per-round vector against
    the (state × state) matrix — matrix-vector products as relational
    algebra, the same shape as graph_shortest_path_bounded's min-plus
    rounds but on the probability semiring.

    Integer-micro discipline end to end: transition probabilities are
    exact integer division (cnt·1e6 // row-total), each round's vector is
    floor-quantized back to micros after the Σ p·q product, so both
    engines run identical integer recurrences — no float order anywhere.
    Per round the join touches |states|² cells (the matrix is
    group-cardinality, broadcastable at any corpus size; only the ONE
    LEAD pass over events touches data)."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("a"), F.lead("event_type").over(w).alias("b")
    ).where(F.col("b").isNotNull())
    wa = Window.partitionBy("a")
    m = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("row_total", F.sum("cnt").over(wa))
        .select(
            "a",
            "b",
            # integer div, matching the oracle's // — a float division
            # here truncates in Spark but ROUNDS under DuckDB's
            # CAST(double AS BIGINT), an off-by-one that compounds
            # through the iteration (caught by the first compare)
            F.expr("CAST((cnt * 1000000) div row_total AS BIGINT)").alias(
                "p_micro"
            ),
        )
    ).persist()

    def step(prev: DataFrame | None) -> DataFrame:
        if prev is None:
            return m.groupBy("a").agg(
                F.sum(F.when(F.col("b") == "purchase", F.col("p_micro")).otherwise(0))
                .cast("bigint")
                .alias("q")
            )
        pv = prev.select(F.col("a").alias("pb"), F.col("q").alias("pq"))
        weighted = m.join(F.broadcast(pv), m["b"] == pv["pb"], "left").select(
            "a",
            (
                F.col("p_micro")
                * F.when(F.col("b") == "purchase", F.lit(1_000_000)).otherwise(
                    F.coalesce(F.col("pq"), F.lit(0))
                )
            ).alias("term"),
        )
        return (
            weighted.groupBy("a")
            .agg(F.sum("term").alias("term_sum"))
            .select("a", F.expr("CAST(term_sum div 1000000 AS BIGINT)").alias("q"))
        )

    q1 = step(None)
    q2 = step(q1)
    q3 = step(q2)
    return (
        q1.select(F.col("a").alias("event_type"), F.col("q").alias("p1_micro"))
        .join(q2.select(F.col("a").alias("event_type"), F.col("q").alias("p2_micro")), "event_type")
        .join(q3.select(F.col("a").alias("event_type"), F.col("q").alias("p3_micro")), "event_type")
    )
