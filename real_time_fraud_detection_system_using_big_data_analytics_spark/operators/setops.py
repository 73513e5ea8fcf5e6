"""Set operations: union (all/distinct/by-name), intersect, except.

Absent in the reference (SURVEY §2.11). UNION ALL is a zero-shuffle
concatenation of partitions; DISTINCT/INTERSECT/EXCEPT shuffle on the full
row — at scale, prefer keyed anti/semi joins (operators/joins.py) when a
key exists, which shuffle only the key columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_tables


def _high_value(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id")
    signups = ev.filter(F.col("event_type") == "signup").select("user_id")
    return purchases, signups


@register(
    "setop_union_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT user_id FROM events WHERE event_type = 'signup'
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union): pure partition concatenation — zero
    shuffle, both branch filters pushed to their scans."""
    purchases, signups = _high_value(spark, sf_dir)
    return purchases.unionAll(signups)


@register(
    "setop_union_distinct",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    UNION
    SELECT user_id FROM events WHERE event_type = 'signup'
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UNION (set semantics): concatenate then one hash-distinct
    shuffle with map-side partial dedup — shuffled bytes bounded by
    distinct user_id cardinality."""
    purchases, signups = _high_value(spark, sf_dir)
    return purchases.union(signups).distinct()


@register(
    "setop_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users who both purchased and errored (INTERSECT = distinct rows in
    both sides)."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id")
    errors = ev.filter(F.col("event_type") == "error").select("user_id")
    return purchases.intersect(errors)


@register(
    "setop_except",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'signup'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed-up users who never purchased. `subtract` is EXCEPT DISTINCT
    (SQL EXCEPT semantics); `exceptAll` would only cancel per-occurrence
    multiplicities, leaving rows that appear more often on the left."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    signups = ev.filter(F.col("event_type") == "signup").select("user_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return signups.subtract(purchases)


@register(
    "setop_union_by_name",
    oracle="""
    SELECT c_custkey AS entity_key, c_name AS entity_name, 'customer' AS kind
    FROM customer
    UNION ALL
    SELECT s_suppkey AS entity_key, s_name AS entity_name, 'supplier' AS kind
    FROM supplier
    """,
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName: schema-aligned union of differently-shaped inputs —
    the columns are named into a common shape first (order differs between
    the two selects; unionByName aligns by name, not position)."""
    t = load_tables(spark, sf_dir, names=("customer", "supplier"))
    customers = t["customer"].select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("entity_name"),
        F.lit("customer").alias("kind"),
    )
    suppliers = t["supplier"].select(
        F.lit("supplier").alias("kind"),
        F.col("s_name").alias("entity_name"),
        F.col("s_suppkey").alias("entity_key"),
    )
    return customers.unionByName(suppliers)


@register(
    "setop_intersect_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT ALL
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics INTERSECT ALL (each row kept min(m, n) times —
    multiplicity matters when the row IS the unit of spend/activity).
    Spark plans intersectAll as one aggregate of per-side counts plus a
    generate — the same single-shuffle shape as distinct INTERSECT."""
    purchases, errors = _purchases_errors(spark, sf_dir)
    return purchases.intersectAll(errors)


@register(
    "setop_except_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics EXCEPT ALL (each row kept max(m-n, 0) times) — the
    multiset difference that answers 'purchases beyond the error count'
    per user; same count-aggregate physical shape as intersectAll."""
    purchases, errors = _purchases_errors(spark, sf_dir)
    return purchases.exceptAll(errors)


def _purchases_errors(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id")
    errors = ev.filter(F.col("event_type") == "error").select("user_id")
    return purchases, errors
