"""Principal-component extraction over the embeddings table: deterministic
power iteration, DuckDB-oracle-checked end-to-end (the clustering.py
playbook applied to an eigenproblem).

PCA is the embedding-analytics primitive the similarity suite was missing:
the top component's loadings diagnose anisotropy (is one latent direction
dominating the space? do cosine distances still mean anything?) and feed
whitening / dimensionality reduction upstream of ANN indexing.

Why a custom formulation instead of MLlib's PCA: same reason as
clustering.py — MLlib computes via a driver-side eigendecomposition of a
Gram matrix with engine-private numerics (rows-only checkable). This
power iteration pins every numeric so the WHOLE iterative algorithm is
value-checked cross-engine:

- init v0 = q6(1/sqrt(dim)) in every coordinate (no RNG);
- per iteration, the matrix-vector product C·v is computed WITHOUT
  materializing the covariance matrix, via the identity
      (C·v)[p] = avg_i(s_i · x_i[p]) − avg_i(s_i) · mu[p],
      s_i = x_i·v − mu·v
  so each iteration is one map (fold-dot, bitwise-equal to DuckDB's
  list_dot_product — see clustering._fold_dot) plus ONE (dim×1) partial
  aggregate; averages keep magnitudes O(1) so the q6 state quantization
  dominates cross-engine float-summation-order noise;
- after each iteration u is quantized q6, normalized with the sequential
  sqrt(u·u), and re-quantized — both engines iterate from bit-identical
  vectors, exactly the k-means centroid-sync trick.

Scale posture: per iteration the vector table is scanned once, map-only,
followed by a dim-sized shuffle (64 partial sums) — the classic
distributed-PCA shape. State is O(dim) on the driver (mu, v), never the
O(dim²) covariance; at 100 TB nothing changes but the scan time. Top-k
components would deflate and repeat (documented, not needed here).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import q, q_sql
from ..plans.registry import register
from .clustering import _fold_dot, _prepare_vecs, _seq_dot

_ITER = 3
_QS = 6  # state quantization decimals (cross-engine sync, as k-means)


def _qpy(x: float, scale: int = _QS) -> float:
    """Driver-side twin of q()/q_sql: FLOOR(x*10^s + 0.5)/10^s with the
    same IEEE double ops (Python floats are IEEE doubles)."""
    factor = float(10**scale)
    return math.floor(x * factor + 0.5) / factor


def _iter_sql(prev: str, this: str) -> str:
    """One power-iteration step as CTEs: s = x·v − mu·v per row, the
    averaged products, the quantized un-normalized u, then the normalized
    quantized v. Mirrors the Spark step bit-for-bit at the q6 boundary."""
    return f"""
    s{this} AS (
      SELECT v.vec_id, v.e,
             list_dot_product(v.e, (SELECT l FROM v{prev}l))
               - (SELECT list_dot_product(m.l, vp.l) FROM mul m, v{prev}l vp) AS s
      FROM vecs v
    ),
    a{this} AS (
      SELECT d.pos, AVG(s{this}.s * s{this}.e[d.pos]) AS s1p, AVG(s{this}.s) AS s0
      FROM s{this} CROSS JOIN dims d GROUP BY d.pos
    ),
    u{this} AS (
      SELECT a.pos, {q_sql("a.s1p - a.s0 * mu.m", _QS)} AS u
      FROM a{this} a JOIN mu ON mu.pos = a.pos
    ),
    u{this}l AS (SELECT list(u ORDER BY pos) AS l FROM u{this}),
    n{this} AS (SELECT sqrt(list_dot_product(l, l)) AS nrm FROM u{this}l),
    v{this} AS (
      SELECT u.pos, {q_sql("u.u / n.nrm", _QS)} AS w FROM u{this} u, n{this} n
    ),
    v{this}l AS (SELECT list(w ORDER BY pos) AS l FROM v{this})"""


_PCA_ORACLE = (
    f"""
    WITH vecs AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    ndim AS (SELECT MAX(len(e)) AS d FROM vecs),
    dims AS (
      SELECT unnest(generate_series(1, (SELECT d FROM ndim))) AS pos
    ),
    mu AS (
      SELECT d.pos, {q_sql("AVG(v.e[d.pos])", _QS)} AS m
      FROM vecs v CROSS JOIN dims d GROUP BY d.pos
    ),
    mul AS (SELECT list(m ORDER BY pos) AS l FROM mu),
    v0 AS (
      SELECT d.pos, {q_sql("1.0 / sqrt(nd.d)", _QS)} AS w
      FROM dims d CROSS JOIN ndim nd
    ),
    v0l AS (SELECT list(w ORDER BY pos) AS l FROM v0),"""
    + ",".join(_iter_sql(str(t - 1), str(t)) for t in range(1, _ITER + 1))
    + f""",
    sf AS (
      SELECT list_dot_product(v.e, (SELECT l FROM v{_ITER}l))
               - (SELECT list_dot_product(m.l, vf.l) FROM mul m, v{_ITER}l vf) AS s
      FROM vecs v
    ),
    ev AS (SELECT {q_sql("AVG(s * s)", 4)} AS var_explained FROM sf)
    SELECT vf.pos AS pos, mu.m AS mu, vf.w AS loading, ev.var_explained
    FROM v{_ITER} vf JOIN mu ON mu.pos = vf.pos CROSS JOIN ev
    """
)


@register("embedding_pca_power", oracle=_PCA_ORACLE)
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding cloud via {_ITER} fixed
    power iterations (see module docstring for the numerics contract).
    Returns one row per dimension: the mean vector, the component
    loadings, and the component's variance (Rayleigh quotient, q4)."""
    vecs = _prepare_vecs(spark, sf_dir)

    mu_rows = (
        vecs.select(F.posexplode("e").alias("pos", "x"))
        .groupBy("pos")
        .agg(q(F.avg("x"), _QS).alias("m"))
        .orderBy("pos")
        .collect()
    )
    mu = [r["m"] for r in mu_rows]
    # one row per position == the dimensionality: no separate first() job
    dim = len(mu_rows)
    v = [_qpy(1.0 / math.sqrt(dim))] * dim

    def s_col(vec: list[float]):
        return _fold_dot(F.col("e"), F.lit(np.array(vec, dtype=np.float64))) - F.lit(
            _seq_dot(mu, vec)
        )

    for _ in range(_ITER):
        agg = (
            vecs.select(s_col(v).alias("s"), F.posexplode("e").alias("pos", "x"))
            .groupBy("pos")
            .agg(F.avg(F.col("s") * F.col("x")).alias("s1p"), F.avg("s").alias("s0"))
            .orderBy("pos")
            .collect()
        )
        u = [_qpy(r["s1p"] - r["s0"] * mu[r["pos"]]) for r in agg]
        nrm = math.sqrt(_seq_dot(u, u))
        v = [_qpy(x / nrm) for x in u]

    ev = vecs.select(s_col(v).alias("s")).agg(
        q(F.avg(F.col("s") * F.col("s")), 4).alias("var_explained")
    )
    rows = spark.createDataFrame(
        [(i + 1, mu[i], v[i]) for i in range(dim)],
        "pos bigint, mu double, loading double",
    )
    # NOTE: no unpersist here — `ev` is lazy and still reads `vecs`; an
    # eager unpersist forced the returned plan to recompute the fan-out
    # from parquet when the consumer finally ran it.
    return rows.crossJoin(F.broadcast(ev))
