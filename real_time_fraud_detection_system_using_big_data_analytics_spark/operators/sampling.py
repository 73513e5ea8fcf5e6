"""Sorting, top-k, limits, sampling, distinct/dedup.

Reference parity: randomSplit (fraud_detection_model.py:86, L1), pandas
head as limit (transaction_producer.py:74-75, L2), OFFSET/LIMIT pagination
(postgres_model_inference.py:272, L3 — reproduced deterministically here).
Sorts/top-k/distinct are engine additions (SURVEY §2.4-L4, §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_tables


@register(
    "sort_topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def sort_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit compiles to TakeOrderedAndProject —
    each partition keeps only its local top-25, the driver merges k*p rows.
    No global sort is materialized (this is why it scales: top-25 of 100 TB
    moves 25 rows per partition, not the data)."""
    o = load_tables(spark, sf_dir, names=("orders",))["orders"]
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


@register(
    "paginate_deterministic",
    oracle="""
    WITH numbered AS (
      SELECT event_id, user_id, event_type,
             ROW_NUMBER() OVER (ORDER BY event_id) AS rn
      FROM events
    )
    SELECT event_id, user_id, event_type FROM numbered
    WHERE rn > 100 AND rn <= 200
    """,
)
def paginate_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pagination (page 2 of size 100, keyed by event_id).

    The reference paginates Postgres with ORDER-BY-less OFFSET/LIMIT
    (postgres_model_inference.py:272) — rows can repeat or drop across
    pages. This is the engine's deterministic replacement: row_number over
    a total order. At scale, pagination should instead be key-range
    predicates (WHERE id > last_seen LIMIT n) — pushdown-able and
    stateless; this query documents the window formulation.
    """
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    w = Window.orderBy("event_id")
    return (
        ev.select("event_id", "user_id", "event_type", F.row_number().over(w).alias("rn"))
        .filter((F.col("rn") > 100) & (F.col("rn") <= 200))
        .drop("rn")
    )


@register(
    "sample_deterministic_mod",
    oracle="""
    SELECT event_id, user_id, ROUND(value, 2) AS value
    FROM events
    WHERE event_id % 20 = 0
    """,
)
def sample_deterministic_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5% sample by key modulus — reproducible across
    engines and runs (unlike Bernoulli `sample()`, provided separately as
    rows-only `sample_bernoulli`)."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    return (
        ev.filter(F.col("event_id") % 20 == 0)
        .select("event_id", "user_id", F.round("value", 2).alias("value"))
    )


@register(
    "sample_bernoulli",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           TRUE AS size_within_bound,
           TRUE AS no_duplicates
    FROM events
    """,
)
def sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample (reference L1's randomSplit uses the same
    mechanism, fraud_detection_model.py:86), registered as a statistical
    AUDIT since r8 (the ship-the-measurement conversion proven on
    agg_approx_count_distinct in r6): the RNG draw itself is not
    reproducible in DuckDB, but its REQUIRED properties are — the sample
    size must land inside a 6-sigma binomial band around fraction*n
    (P(false fail) < 2e-9), and a without-replacement sample must contain
    no duplicate keys. A broken sampler (wrong fraction, replacement
    semantics, seed drift into bias) now surfaces as a value MISMATCH
    against the oracle's exact count + TRUE flags rather than as an
    unverifiable rows-only record."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    samp = ev.sample(fraction=0.1, seed=42).select("event_id")
    stats = ev.agg(F.count("*").alias("n_total")).crossJoin(
        samp.agg(
            F.count("*").alias("n_samp"),
            F.count_distinct("event_id").alias("n_distinct"),
        )
    )
    # 6-sigma binomial band: |n_samp - p*n| <= 6*sqrt(n*p*(1-p)), p=0.1
    return stats.select(
        F.col("n_total").cast("bigint").alias("n_total"),
        (
            F.abs(F.col("n_samp") - 0.1 * F.col("n_total"))
            <= 6.0 * F.sqrt(F.col("n_total") * 0.1 * 0.9)
        ).alias("size_within_bound"),
        (F.col("n_samp") == F.col("n_distinct")).alias("no_duplicates"),
    )


@register(
    "random_split",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           TRUE AS partition_exact,
           TRUE AS disjoint_ok,
           TRUE AS train_within_bound
    FROM events
    """,
)
def random_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference L1 parity: 80/20 randomSplit(seed=42) as in
    fraud_detection_model.py:86, registered as a statistical AUDIT since
    r8 (same conversion as sample_bernoulli). randomSplit's contract —
    the reference's data contract for its train/test split — is that the
    two splits PARTITION the input: together they cover every row exactly
    once (n_train + n_test == n), they are disjoint (no event_id appears
    in both), and the train share lands in a 6-sigma binomial band around
    0.8*n. All three are checked in-engine and emitted as booleans the
    DuckDB oracle pins to TRUE, so the classic randomSplit failure mode
    (non-deterministic upstream ordering causing duplicated/dropped rows
    between re-evaluations of the two splits) is now a hash FAILURE, not
    an invisible rows-only record."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    train, test = ev.randomSplit([0.8, 0.2], seed=42)
    tr = train.select("event_id")
    te = test.select("event_id")
    stats = (
        ev.agg(F.count("*").alias("n_total"))
        .crossJoin(tr.agg(F.count("*").alias("n_train")))
        .crossJoin(te.agg(F.count("*").alias("n_test")))
        .crossJoin(
            tr.join(te, "event_id", "inner").agg(F.count("*").alias("n_overlap"))
        )
    )
    return stats.select(
        F.col("n_total").cast("bigint").alias("n_total"),
        (F.col("n_train") + F.col("n_test") == F.col("n_total")).alias(
            "partition_exact"
        ),
        (F.col("n_overlap") == 0).alias("disjoint_ok"),
        (
            F.abs(F.col("n_train") - 0.8 * F.col("n_total"))
            <= 6.0 * F.sqrt(F.col("n_total") * 0.8 * 0.2)
        ).alias("train_within_bound"),
    )


@register(
    "distinct_rows",
    oracle="""
    SELECT DISTINCT event_type, user_id
    FROM events
    """,
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DISTINCT over a 2-column projection: one hash shuffle on
    the pair with map-side partial dedup (HashAggregate both sides of
    the Exchange), so shuffled bytes scale with distinct cardinality,
    not row count — the correct shape at 100 TB."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    return ev.select("event_type", "user_id").distinct()


@register(
    "dedup_keep_first_by_key",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_id, ts, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT user_id, event_id, ts, event_type FROM ranked WHERE rn = 1
    """,
)
def dedup_keep_first_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the earliest row per key — the deterministic
    form of `dropDuplicates(["user_id"])` (which keeps an arbitrary row;
    here the window order pins which survivor is kept, so the result is
    reproducible and oracle-checkable)."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


@register(
    "split_by_hash",
    oracle="""
    WITH assigned AS (
      SELECT CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '19999999999999999999999999999999' THEN 'validation'
                  WHEN md5(CAST(doc_id AS VARCHAR)) < '33333333333333333333333333333333' THEN 'test'
                  ELSE 'train' END AS split
      FROM documents
    )
    SELECT split, COUNT(*) AS n
    FROM assigned GROUP BY split
    """,
)
def split_by_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/validation/test split by key hash — the
    scalable alternative to randomSplit: assignment depends only on the
    row key (stable across reruns, cluster sizes, and engines; no RNG, no
    seed coordination), so the split is reproducible AND joinable. Hex
    range boundaries give ~10% validation / ~10% test / ~80% train."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    h = F.md5(F.col("doc_id").cast("string"))
    split = (
        F.when(h < "19999999999999999999999999999999", "validation")
        .when(h < "33333333333333333333333333333333", "test")
        .otherwise("train")
    )
    return d.select(split.alias("split")).groupBy("split").agg(F.count("*").alias("n"))
