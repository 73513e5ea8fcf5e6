"""Distributed k-means over the embeddings table (north-star similarity
family): deterministic seeded Lloyd iterations, DuckDB-oracle-checked.

MLlib's KMeans is rows-only-checkable (random init, engine-private
tie-breaks); this formulation pins every source of nondeterminism so the
whole iterative algorithm is value-checked cross-engine:

- init = the K lowest vec_ids' embeddings (no RNG);
- assignment = argmin over squared L2 with ties broken by centroid id
  (array_min over (dist, cid) structs — lexicographic, deterministic);
- after each mean-recompute the centroid coordinates are ROUNDED to 6
  decimals on both sides, so iteration N+1 starts from bit-identical
  centroids in both engines (unrounded means differ in the last float
  bits because summation order differs — quantization is the same trick
  the rank-score rounding uses, applied to the iterative state).

Scale posture: classic Spark k-means shape — centroids are K×dim (tiny,
always driver-safe) and broadcast into a single in-row argmin expression,
so assignment is map-only over the vector table; the mean recompute is one
(cluster, dim) partial aggregate after a posexplode. Per iteration: one
shuffle of (K × dim) partial sums, nothing else. The vector table is
scanned once per iteration with no self-join anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import q, q_sql
from ..plans.registry import register
from ..sources.tables import fan_out, load_tables

K = 8
ITERATIONS = 2
_CROUND = 6  # centroid quantization decimals (cross-engine state sync)


def _sq_dist(e: Column, c: Column) -> Column:
    """Squared L2 between two double arrays via one zip_with fold."""
    return F.aggregate(
        F.zip_with(e, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _best_assignment(centroids: list[list[float]]) -> Column:
    """(dist, cid) of the nearest centroid as ONE expression: the K×dim
    centroid matrix rides along as a single nested-array literal and the
    argmin is a transform over centroid indices + array_min — a compact
    expression tree (K unrolled distance folds made Catalyst
    analysis/codegen the dominant cost at small data sizes)."""
    matrix = F.array(*[F.array(*[F.lit(v) for v in c]) for c in centroids])
    cands = F.transform(
        F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
        lambda i: F.struct(
            _sq_dist(F.col("e"), F.element_at(matrix, i + 1)).alias("d"),
            i.alias("cid"),
        ),
    )
    return F.array_min(cands)


def _kmeans_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    vecs = fan_out(base).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    ).persist()

    # seed rounding happens in Spark SQL (same ROUND semantics as the
    # oracle's, not Python's banker rounding)
    seeds = (
        vecs.orderBy("vec_id")
        .limit(K)
        .select(F.transform("e", lambda x: F.round(x, _CROUND)).alias("c"))
        .collect()
    )
    centroids = [list(r["c"]) for r in seeds]

    for _ in range(ITERATIONS):
        assigned = vecs.select(
            "vec_id", "e", _best_assignment(centroids)["cid"].alias("cid")
        )
        # mean per (cluster, dim): one partial-aggregated shuffle of K×dim sums
        means = (
            assigned.select("cid", F.posexplode("e").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
            )
            .select("cid", F.transform("pm", lambda s: F.round(s["m"], _CROUND)).alias("c"))
            .orderBy("cid")
            .collect()
        )
        new_centroids = {r["cid"]: list(r["c"]) for r in means}
        # clusters that lost every point keep their previous centroid
        centroids = [new_centroids.get(cid, centroids[cid]) for cid in range(K)]

    final = vecs.select(
        "vec_id", _best_assignment(centroids).alias("best")
    ).select("vec_id", F.col("best.d").alias("d"), F.col("best.cid").alias("cid"))
    out = final.groupBy("cid").agg(
        F.count("*").alias("n_points"),
        q(F.avg("d")).alias("avg_sq_dist"),
    )
    vecs.unpersist()
    return out.select(F.col("cid").cast("bigint").alias("cluster_id"), "n_points", "avg_sq_dist")


def _kmeans_oracle() -> str:
    """Same fixpoint in DuckDB SQL: iterative CTE chain (unrolled — the
    iteration count is a compile-time constant on both sides)."""

    def assign(cent: str, this: str) -> str:
        return f"""
    {this} AS (
      SELECT v.vec_id, v.e, v.cid, v.dist FROM (
        SELECT v.vec_id, v.e, c.cid,
               list_dot_product(v.e, v.e) - 2 * list_dot_product(v.e, c.cvec)
                 + list_dot_product(c.cvec, c.cvec) AS dist,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
                 list_dot_product(v.e, v.e) - 2 * list_dot_product(v.e, c.cvec)
                   + list_dot_product(c.cvec, c.cvec), c.cid) AS rn
        FROM vecs v CROSS JOIN {cent} c
      ) AS v(vec_id, e, cid, dist, rn) WHERE rn = 1
    )"""

    def recompute(assigned: str, prev: str, this: str) -> str:
        return f"""
    {this}_m AS (
      SELECT a.cid, i.i AS pos, ROUND(AVG(a.e[i.i]), {_CROUND}) AS m
      FROM {assigned} a CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) i
      GROUP BY a.cid, i.i
    ),
    {this}_new AS (
      SELECT cid, list(m ORDER BY pos) AS cvec FROM {this}_m GROUP BY cid
    ),
    {this} AS (
      SELECT p.cid, COALESCE(n.cvec, p.cvec) AS cvec
      FROM {prev} p LEFT JOIN {this}_new n ON n.cid = p.cid
    )"""

    sql = f"""
    WITH vecs AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    seeds AS (
      SELECT vec_id, e, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid
      FROM vecs ORDER BY vec_id LIMIT {K}
    ),
    c0 AS (
      SELECT cid, list_transform(e, x -> ROUND(x, {_CROUND})) AS cvec FROM seeds
    )"""
    cent = "c0"
    for it in range(ITERATIONS):
        sql += "," + assign(cent, f"a{it}")
        sql += "," + recompute(f"a{it}", cent, f"c{it + 1}")
        cent = f"c{it + 1}"
    sql += "," + assign(cent, "afinal")
    sql += f"""
    SELECT CAST(cid AS BIGINT) AS cluster_id,
           COUNT(*) AS n_points,
           {q_sql("AVG(dist)")} AS avg_sq_dist
    FROM afinal GROUP BY cid
    """
    return sql


@register("cluster_kmeans_embeddings", oracle=_kmeans_oracle())
def cluster_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic distributed k-means (K=8, 2 Lloyd iterations) over the
    embedding corpus; returns per-cluster sizes and mean squared distance.
    See module docstring for the determinism contract and scale shape."""
    return _kmeans_spark(spark, sf_dir)
