"""Skew-handling join: explicit key salting.

AQE's skew-join split (enabled in session.py) handles most skew at
runtime, but it only splits the SHUFFLE partitions of a sort-merge join —
when one key utterly dominates (the classic 'null key' / 'default id'
hotspot), pre-salting is still the deterministic fix: the hot side's key
is split into N sub-keys, the other side is replicated N ways, and the
join runs on (key, salt) with N× the parallelism on the hot key.

Deterministic salt: pmod(xxhash64(unique_id), n) — no RNG, so results are
reproducible and the operator is oracle/unit testable (the salt column
never leaks into the output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import rev_e4
from ..plans.registry import register
from ..sources.tables import load_tables


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``skewed`` (hot keys) to ``other`` on ``key`` with an N-way
    salt.

    skewed gains salt = pmod(xxhash64(salt_from), n_salts); other is
    replicated once per salt value via an in-row explode (NOT a UNION — one
    scan). The join key becomes (key, salt), spreading each hot key over
    n_salts shuffle partitions. Output columns = the plain join's columns.

    At 100 TB: n_salts is sized to the observed hot-key row count per
    partition target; the replication cost is n_salts × |other|, so salt
    only the joins whose right side is small-ish (dimension or
    pre-aggregated) — exactly the joins where one hot fact key hurts most.
    """
    salted = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts)).cast("int")
    )
    # (generators can't nest inside expressions; sequence of int literals
    # already explodes to int, matching the casted pmod on the other side)
    replicated = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted.join(replicated, on=[key, "__salt"], how=how).drop("__salt")


@register(
    "join_skew_salted",
    oracle="""
    SELECT p.p_brand AS brand,
           COUNT(*) AS n_items,
           CAST(SUM((CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT) * (100 - CAST(FLOOR(l.l_discount * 100 + 0.5) AS BIGINT)))) AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim join, value-identical to the plain join (the oracle
    IS the plain join — salting must be semantics-neutral).

    lineitem gains a deterministic 8-way salt from its unique
    (orderkey, linenumber) row id; part replicates 8× via an in-row
    explode; the join runs on (partkey, salt). Each hot partkey's rows
    spread over 8 shuffle partitions instead of 1.

    At 100 TB: AQE's skew split only helps after the skewed shuffle blocks
    exist; pre-salting bounds the per-task input up front, which matters
    when a single key exceeds executor memory (the 'default id' hotspot).
    The 8× replication prices out for dimension-sized right sides only —
    exactly where hot fact keys concentrate.
    """
    t = load_tables(spark, sf_dir, names=("lineitem", "part"))
    li = t["lineitem"].withColumn(
        "__row_id",
        F.col("l_orderkey") * F.lit(8) + F.col("l_linenumber"),
    ).withColumnRenamed("l_partkey", "p_partkey")
    joined = salted_join(
        li,
        t["part"].select("p_partkey", "p_brand"),
        key="p_partkey",
        salt_from="__row_id",
        n_salts=8,
    )
    return joined.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count("*").alias("n_items"),
        (F.sum(rev_e4()).cast("double") / 10000.0).alias("revenue"),
    )


@register(
    "agg_skew_two_phase",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS total_value_cents
    FROM events GROUP BY event_type
    """,
)
def agg_skew_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase (salted) aggregation for skewed group keys, value-equal
    to the plain aggregate (the oracle IS the plain aggregate — salting
    must be semantics-neutral). Phase 1 groups on (key, salt-of-unique-id)
    so one hot key spreads over 16 reduce partitions; phase 2 merges the
    16 partial states per key. Counts and cent-sums re-aggregate with SUM
    — the same semigroup algebra etl_incremental_agg_merge relies on.

    Spark's own map-side partial aggregation usually makes this rewrite
    unnecessary (partials collapse per TASK before the shuffle) — the
    explicit two-phase form is for the case that defeats partial agg:
    high-cardinality-input aggregates (exact distinct, collect_list)
    on a hot key, where phase-1 state itself would not fit one reducer.
    Deterministic salt (pmod(xxhash64(event_id), 16)), no RNG."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    cents = F.round(F.col("value") * 100).cast("long")
    partial = (
        ev.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col("event_id")), F.lit(16)).cast("int")
        )
        .groupBy("event_type", "__salt")
        .agg(F.count("*").alias("n_part"), F.sum(cents).alias("cents_part"))
    )
    return partial.groupBy("event_type").agg(
        F.sum("n_part").alias("n_events"),
        F.sum("cents_part").cast("long").alias("total_value_cents"),
    )
