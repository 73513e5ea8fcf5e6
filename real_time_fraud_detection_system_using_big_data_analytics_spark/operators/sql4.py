"""Spark 4 SQL-surface operators: session variables, SQL UDFs (scalar and
table-valued), procedural SQL scripting, string collations, and XML parse.

These close the last modern-SQL API gaps the reference never had (its only
SQL is `spark.sql` string templates with f-string splicing,
`postgres_model_inference.py` / `spark_streaming_app.py`): the engine
exposes the sanctioned Spark-4 alternatives — typed session variables
instead of f-string splicing, SQL-body functions instead of Python UDFs for
shareable logic, scripting blocks instead of driver-side Python loops, and
collation-aware comparison instead of `lower()` scattered through every
predicate.

Scale posture: everything here is surface syntax over Catalyst — variables
and SQL UDF bodies are inlined/eliminated at analysis time, so plans are
identical to the hand-inlined spelling (no Python worker, no extra shuffle,
whole-stage codegen preserved). The scripting WHILE loop runs O(log range)
driver-side COUNT queries, each a scan-local partial aggregate; loop state
is one scalar, never data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_tables


@register(
    "sql_session_variables",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS min_cents
    FROM orders
    WHERE o_totalprice > (SELECT MAX(o_totalprice) / 2 FROM orders)
    GROUP BY o_orderpriority
    """,
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed session variables (Spark 4 DECLARE / SET VARIABLE): a
    threshold computed from the data by one scalar query, bound as a
    session variable, then referenced by name in a second statement — the
    injection-safe, plan-cache-friendly replacement for the reference's
    f-string SQL templating (`postgres_model_inference.py:266-285`). The
    variable holds MAX/2: MAX is order-insensitive and exact in IEEE
    double, and /2 is an exponent decrement, so both engines bind the
    bit-identical threshold and the boundary rows cannot flip. The oracle
    inlines the subquery — equality proves variable binding is pure
    surface syntax (Catalyst folds the variable to a literal at analysis,
    so the filter still pushes to the scan)."""
    load_tables(spark, sf_dir, names=("orders",))
    spark.sql("DECLARE OR REPLACE VARIABLE half_max_price DOUBLE")
    spark.sql(
        "SET VARIABLE half_max_price = (SELECT MAX(o_totalprice) / 2 FROM orders)"
    )
    return spark.sql(
        """
        SELECT o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(MIN(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS min_cents
        FROM orders
        WHERE o_totalprice > half_max_price
        GROUP BY o_orderpriority
        """
    )


@register(
    "sql_udf_scalar",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           CAST(MAX(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS max_cents
    FROM events
    GROUP BY event_type
    """,
)
def sql_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-body scalar function (Spark 4 CREATE FUNCTION ... RETURN expr):
    the engine's canonical cents-quantization rule declared ONCE as a
    named function and reused across statements — the sanctioned way to
    share scalar logic without a Python UDF. The body is inlined by the
    analyzer (no function-call frame, no worker round-trip; the plan is
    identical to writing the expression inline, which is exactly what the
    DuckDB oracle does), so this also pins that SQL UDFs keep whole-stage
    codegen. Reference contrast: `fraud_detection_model.py` repeats its
    casts at every use site."""
    load_tables(spark, sf_dir, names=("events",))
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION to_cents(x DOUBLE)
        RETURNS BIGINT
        RETURN CAST(FLOOR(x * 100 + 0.5) AS BIGINT)
        """
    )
    return spark.sql(
        """
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(to_cents(value)) AS BIGINT) AS sum_cents,
               CAST(MAX(to_cents(value)) AS BIGINT) AS max_cents
        FROM events
        GROUP BY event_type
        """
    )


@register(
    "sql_udf_table_lateral",
    oracle="""
    SELECT r.r_name AS region_name,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           MIN(n.n_name) AS first_nation
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def sql_udf_table_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL table-valued function with LATERAL correlation (Spark 4): a
    parameterized relation (`region_nations(rk)`) declared in SQL and
    invoked per outer row — the declarative twin of the Python UDTF
    (udf_surface.py) with zero Python in the plan. Catalyst decorrelates
    the lateral call into an ordinary equi-join (the oracle IS that
    join), so the convenience syntax costs nothing: same shuffle keys,
    same broadcast opportunity, no nested-loop execution. The fallback
    for engines without lateral TVFs is exactly the oracle spelling."""
    load_tables(spark, sf_dir, names=("region", "nation"))
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION region_nations(rk BIGINT)
        RETURNS TABLE(n_nationkey BIGINT, n_name STRING)
        RETURN SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = rk
        """
    )
    return spark.sql(
        """
        SELECT r.r_name AS region_name,
               CAST(COUNT(*) AS BIGINT) AS n_nations,
               MIN(t.n_name) AS first_nation
        FROM region r, LATERAL region_nations(r.r_regionkey) t
        GROUP BY r.r_name
        """
    )


@register(
    "sql_scripting_while",
    oracle="""
    WITH ks AS (SELECT k FROM generate_series(0, 40) AS t(k)),
    counts AS (
      SELECT k,
             100.0 * power(2.0, k) AS thr,
             (SELECT COUNT(*) FROM orders
              WHERE o_totalprice > 100.0 * power(2.0, k)) AS cnt
      FROM ks
    )
    SELECT CAST(thr AS BIGINT) AS threshold,
           CAST(cnt AS BIGINT) AS n_above
    FROM counts
    WHERE cnt <= 50
    ORDER BY k
    LIMIT 1
    """,
)
def sql_scripting_while(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Procedural SQL scripting (Spark 4 BEGIN/DECLARE/WHILE): an
    exponential threshold search — double `t` until at most 50 orders
    exceed it — written as a scripting block instead of a driver-side
    Python loop. Loop state is ONE scalar; each iteration is a full
    scan-local COUNT (O(log(range)) ≈ 13 passes), which is the honest
    cost model of any iterative-until-converged query and the shape
    driver-side loops take today. Thresholds are 100·2^k — exactly
    representable doubles — so both engines compare against bit-identical
    constants. The oracle unrolls the loop over generate_series(0,40) and
    takes the FIRST k whose count ≤ 50, which is precisely the WHILE
    exit condition."""
    load_tables(spark, sf_dir, names=("orders",))
    # default-true in Spark 4.1; set defensively for foreign sessions
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(
        """
        BEGIN
          DECLARE t DOUBLE DEFAULT 100.0;
          WHILE (SELECT COUNT(*) FROM orders WHERE o_totalprice > t) > 50 DO
            SET t = t * 2;
          END WHILE;
          SELECT CAST(t AS BIGINT) AS threshold,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
                  WHERE o_totalprice > t) AS n_above;
        END
        """
    )


@register(
    "scalar_collation_groupby",
    oracle="""
    WITH mixed AS (
      SELECT doc_id,
             CASE WHEN (doc_id // 20) % 2 = 0 THEN upper(source) ELSE source END
               AS src_mixed
      FROM documents
    )
    SELECT lower(src_mixed) AS source_lc,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT src_mixed) AS BIGINT) AS n_case_variants
    FROM mixed
    GROUP BY lower(src_mixed)
    """,
)
def scalar_collation_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4 COLLATE UTF8_LCASE): case-insensitive
    GROUP BY expressed as a collated grouping key instead of lower()
    sprinkled at every site — the collation travels WITH the comparison,
    so joins/aggregations/sorts all agree on equality without repeated
    normalization calls. Mixed-case input is synthesized deterministically
    (every other 20-doc block upper-cased — the block stride is chosen
    NOT to alias with the testdata's source = doc_id %% n_sources
    assignment, so every source sees both cases); n_case_variants = 2
    per group is the
    value-checked proof that the collated key actually merged the case
    variants (a binary-collation grouping would yield 1). The emitted key
    is lower(min(...)) — deterministic regardless of which variant the
    collated group picks as representative. Oracle: the lower()-key
    spelling, the pre-collation idiom this feature replaces."""
    load_tables(spark, sf_dir, names=("documents",))
    mixed = F.when(
        (F.floor(F.col("doc_id") / 20) % 2) == 0, F.upper(F.col("source"))
    ).otherwise(F.col("source"))
    docs = spark.table("documents").select(mixed.alias("src_mixed"))
    return docs.groupBy(
        F.collate(F.col("src_mixed"), "UTF8_LCASE").alias("src_ci")
    ).agg(
        F.lower(F.min("src_mixed")).alias("source_lc"),
        F.count("*").cast("bigint").alias("n_docs"),
        F.count_distinct(F.collate(F.col("src_mixed"), "UTF8_BINARY"))
        .cast("bigint")
        .alias("n_case_variants"),
    ).select("source_lc", "n_docs", "n_case_variants")


@register(
    "scalar_from_xml_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events
    GROUP BY event_type
    """,
)
def scalar_from_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingest (Spark 4 from_xml): events serialized to an XML envelope
    per row, parsed back with a typed schema, and rolled up from the
    PARSED fields only — a full serialize→parse round-trip whose group
    totals must equal computing directly on the source columns (the
    oracle). Any parser drift (entity handling, whitespace, numeric
    lexing) breaks the hash. XML is the one wire format the JSON/CSV
    round-trips (etl.py) didn't cover; from_xml is JVM-side and
    codegen-friendly — no Python, no external xml jar in Spark 4. The
    value is quantized to cents BEFORE serialization so the payload is an
    exact integer and the round-trip equality is order-free."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    # XML-escape the one free-text splice ('&' first, then '<'): without
    # this, any '&'/'<' in event_type makes from_xml yield NULL and the
    # rollup silently diverges from the oracle computed on the raw column.
    # from_xml decodes the entities back, so escaped values group
    # identically to the source. event_id/cents are numeric — no escaping.
    type_esc = F.replace(
        F.replace(F.col("event_type"), F.lit("&"), F.lit("&amp;")),
        F.lit("<"),
        F.lit("&lt;"),
    )
    xml = F.concat(
        F.lit("<ev><id>"),
        F.col("event_id"),
        F.lit("</id><type>"),
        type_esc,
        F.lit("</type><cents>"),
        cents,
        F.lit("</cents></ev>"),
    )
    parsed = ev.select(
        F.from_xml(xml, "id BIGINT, type STRING, cents BIGINT").alias("p")
    ).select("p.id", "p.type", "p.cents")
    return parsed.groupBy(F.col("type").alias("event_type")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
    )
