"""Change-data-capture operators: snapshot diff and MERGE/upsert.

The reference's only mutation story is drop-and-reload: to_sql.py:40-62
drops the transactions table and bulk-appends the CSV, and
postgres_model_inference.py appends prediction CSVs. A warehouse-scale
engine needs the incremental versions: given yesterday's snapshot and
today's, emit the insert/update/delete delta (cdc_snapshot_diff); given a
base table and a change set, apply MERGE semantics in one pass
(merge_upsert). Both are single full-outer-join plans on the primary key —
no driver round-trips, no row-at-a-time writes.

Scale posture:
- both operators are ONE shuffle of each input on the primary key, joined
  with sort-merge. At 100 TB the snapshots live bucketed by that key, so
  the exchange disappears entirely and the diff is a partition-local merge;
- row change detection compares columns with null-safe equality. For wide
  tables, compare xxhash64(struct(*cols)) instead so the sort-merge rows
  stay narrow — same plan shape, noted here because the oracle check needs
  the column form (DuckDB has no xxhash64);
- the MERGE source is pre-aggregated (map-side partial agg) before the
  join, so the base table is joined against keys, not raw facts;
- neither plan ever collects: the delta/merged table is itself a DataFrame
  ready for a partitioned write, unlike the reference's pandas round-trip
  sinks (fraud_detection_model.py:91-93).
- money totals are summed as BIGINT *cents*, not double and not decimal:
  a double sum over millions of rows is order-dependent, and decimal sums
  sit on engine-specific precision-widening edges (DuckDB widens
  SUM(DECIMAL(18,2)) to DECIMAL(38,2); an addition of 18,2 + 38,2 has
  formal precision 39, exactly on DuckDB's precision-38 cliff where
  behavior is version-dependent — saturate vs promote-to-double). Integer
  cent arithmetic is exact, order-independent, map-side combinable, and
  has no widening rules to disagree about. The source values carry at most
  2 decimal digits, so ROUND(x*100) is always a clean integer regardless
  of either engine's tie-breaking mode.

Both snapshots are derived deterministically from the orders table (key
slices + an additive price bump) so the operator is DuckDB-oracle-checkable
without mutable state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_tables


def _snapshots(orders: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Deterministic old/new snapshot pair derived from orders.

    old = keys with o_orderkey % 10 != 3  (the %10==3 rows are "later
                                           inserts")
    new = keys with o_orderkey % 10 != 7  (the %10==7 rows got "deleted"),
          with o_totalprice bumped +100 on %5==0 and o_orderstatus forced
          to 'F' on %7==0 (the "updates").
    """
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    old = orders.select(cols).filter(F.col("o_orderkey") % 10 != 3)
    new = orders.filter(F.col("o_orderkey") % 10 != 7).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("F"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.when(F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 100.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return old, new


_SNAPSHOT_SQL = """
    old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 10 != 3
    ), new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN 'F' ELSE o_orderstatus END
               AS o_orderstatus,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 100.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 10 != 7
    )
"""


@register(
    "cdc_snapshot_diff",
    oracle=f"""
    WITH {_SNAPSHOT_SQL}
    , classified AS (
      SELECT CASE
               WHEN o.in_old IS NULL THEN 'insert'
               WHEN n.in_new IS NULL THEN 'delete'
               WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                 OR o.o_totalprice  IS DISTINCT FROM n.o_totalprice
                 THEN 'update'
               ELSE 'unchanged'
             END AS change_type,
             COALESCE(n.o_totalprice, o.o_totalprice) AS price
      FROM (SELECT *, 1 AS in_old FROM old) o
      FULL OUTER JOIN (SELECT *, 1 AS in_new FROM new) n
      USING (o_orderkey)
    )
    SELECT change_type, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(price * 100) AS BIGINT)) AS BIGINT)
             AS total_price_cents
    FROM classified GROUP BY change_type
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify every primary key across two table snapshots as
    insert / delete / update / unchanged in ONE full-outer sort-merge join —
    the incremental replacement for the reference's drop-and-reload ETL
    (to_sql.py:40-48). Side presence is detected with literal marker
    columns (a null data column must not read as "row absent"); change
    detection is null-safe column comparison. The summary aggregate keeps
    the oracle result compact, but the ``classified`` intermediate is
    exactly the delta stream an incremental materialization would consume.
    """
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    old, new = _snapshots(orders)
    o = old.withColumn("in_old", F.lit(1)).alias("o")
    n = new.withColumn("in_new", F.lit(1)).alias("n")
    joined = o.join(n, "o_orderkey", "full_outer")
    changed = (
        ~F.col("o.o_orderstatus").eqNullSafe(F.col("n.o_orderstatus"))
    ) | (~F.col("o.o_totalprice").eqNullSafe(F.col("n.o_totalprice")))
    change_type = (
        F.when(F.col("o.in_old").isNull(), "insert")
        .when(F.col("n.in_new").isNull(), "delete")
        .when(changed, "update")
        .otherwise("unchanged")
    )
    classified = joined.select(
        change_type.alias("change_type"),
        F.coalesce(F.col("n.o_totalprice"), F.col("o.o_totalprice")).alias("price"),
    )
    return classified.groupBy("change_type").agg(
        F.count("*").alias("n"),
        # BIGINT cents on both sides — no decimal widening rules in play,
        # so the typed value hash cannot depend on the engine version
        F.sum(F.round(F.col("price") * 100).cast("long"))
        .cast("long")
        .alias("total_price_cents"),
    )


@register(
    "merge_upsert",
    oracle="""
    WITH source AS (
      SELECT CASE WHEN o_custkey % 50 = 0 THEN o_custkey + 1000000
                  ELSE o_custkey END AS c_custkey,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS delta_cents,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    ), merged AS (
      SELECT COALESCE(b.c_custkey, s.c_custkey) AS c_custkey,
             CASE WHEN b.c_custkey IS NULL THEN 'insert'
                  WHEN s.c_custkey IS NULL THEN 'keep'
                  ELSE 'update' END AS action,
             COALESCE(CAST(ROUND(b.c_acctbal * 100) AS BIGINT), 0)
               + COALESCE(s.delta_cents, 0) AS new_acctbal_cents
      FROM customer b FULL OUTER JOIN source s ON b.c_custkey = s.c_custkey
    )
    SELECT action, COUNT(*) AS n,
           CAST(SUM(new_acctbal_cents) AS BIGINT) AS total_bal_cents
    FROM merged GROUP BY action
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics as one full-outer join: matched base rows get
    the source delta applied (WHEN MATCHED THEN UPDATE), unmatched source
    keys become new rows (WHEN NOT MATCHED THEN INSERT), untouched base
    rows pass through. The source is the orders table pre-aggregated per
    customer — partial aggregation runs map-side, so the join input is one
    row per key, never the raw fact table. A slice of source keys is
    displaced (+1000000) to exercise the insert branch deterministically.
    Balances are summed as BIGINT cents so the merge is exact,
    order-independent, and free of decimal-widening edges (see module
    docstring)."""
    orders, customer = (
        load_tables(spark, sf_dir, names=("orders", "customer"))[t]
        for t in ("orders", "customer")
    )
    source = (
        orders.groupBy(
            F.when(
                F.col("o_custkey") % 50 == 0, F.col("o_custkey") + 1000000
            )
            .otherwise(F.col("o_custkey"))
            .alias("c_custkey")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "delta_cents"
            ),
            F.count("*").alias("n_orders"),
        )
        .alias("s")
    )
    base = customer.select("c_custkey", "c_acctbal").alias("b")
    merged = base.join(source, F.col("b.c_custkey") == F.col("s.c_custkey"), "full_outer")
    action = (
        F.when(F.col("b.c_custkey").isNull(), "insert")
        .when(F.col("s.c_custkey").isNull(), "keep")
        .otherwise("update")
    )
    new_bal_cents = F.coalesce(
        F.round(F.col("b.c_acctbal") * 100).cast("long"), F.lit(0).cast("long")
    ) + F.coalesce(F.col("s.delta_cents"), F.lit(0).cast("long"))
    return (
        merged.select(action.alias("action"), new_bal_cents.alias("new_acctbal_cents"))
        .groupBy("action")
        .agg(
            F.count("*").alias("n"),
            # BIGINT cents on both sides — no widening rules, no version
            # sensitivity; the sum is exact integer arithmetic
            F.sum("new_acctbal_cents").cast("long").alias("total_bal_cents"),
        )
    )
