"""The sanctioned Python UDF surface, demonstrated (SURVEY §2.8).

The reference defines zero UDFs; engine policy is built-ins first. When
Python IS needed, these are the approved shapes, each oracle-checked to
prove the API wrapper does not change semantics:

- scalar pandas_udf (Arrow-vectorized batches) — `udf_pandas_cosine`
- Python UDTF (one row in, many rows out, lateral-join style) —
  `udtf_tokenize_positions`
- applyInPandas / mapInPandas / applyInPandasWithState live in
  operators/joins.py (join_asof_pandas), multimodal/codec.py, and
  streaming/velocity.py respectively.

Determinism note: the pandas UDF accumulates dot/norm LEFT-TO-RIGHT per
row (explicit fold, not numpy SIMD reductions) so the doubles are
bit-identical to both the Spark higher-order-function fold and DuckDB's
list_sum — numpy's pairwise summation would diverge in the last bits.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.scalars import q
from ..plans.registry import register
from ..sources.tables import fan_out, load_tables


def _cosine_pandas_udf():
    # built lazily: the pandas_udf decorator parses its DDL return type
    # through the ACTIVE SparkContext, so it cannot run at module import
    @F.pandas_udf("double")
    def _cosine_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
        def cos(x, y) -> float:
            dot = 0.0
            na = 0.0
            nb = 0.0
            for xi, yi in zip(x, y):
                xi = float(xi)
                yi = float(yi)
                dot += xi * yi
                na += xi * xi
                nb += yi * yi
            return dot / ((na ** 0.5) * (nb ** 0.5))

        return pd.Series([cos(x, y) for x, y in zip(a, b)])

    return _cosine_pandas


@register(
    "udf_pandas_cosine",
    oracle="""
    WITH sub AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE vec_id % 20 = 0 AND vec_id < 1280
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           (FLOOR((list_sum(list_transform(generate_series(1, len(a.embedding)),
                     i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(generate_series(1, len(a.embedding)),
                     i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
              * sqrt(list_sum(list_transform(generate_series(1, len(b.embedding)),
                     i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))))
            * 10000.0 + 0.5) / 10000.0) AS cosine
    FROM sub a JOIN sub b ON a.vec_id < b.vec_id
    """,
)
def udf_pandas_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas_udf computing pairwise cosine on a
    BOUNDED vector subset (vec_id % 20 == 0 AND vec_id < 1280 — ≤64
    vectors / ≤2016 pairs at ANY corpus size, the _BF_QMAX recipe; the
    unbounded 5% subset made this demo's pair join n²/400, 10.4× wall at
    the r11 sf1 gate) — oracle-checked against the pure-SQL formulation to
    prove the Python boundary preserves values bit-for-bit. This is the
    DEMO of the API; the production cosine operators in
    operators/similarity.py stay JVM-side (10-100× less overhead)."""
    e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    sub = fan_out(
        e.filter((F.col("vec_id") % 20 == 0) & (F.col("vec_id") < 1280))
    ).select("vec_id", "embedding")
    a = sub.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    b = sub.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    cosine = _cosine_pandas_udf()
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", q(cosine("emb_a", "emb_b")).alias("cosine"))
    )


@register(
    "udtf_tokenize_positions",
    oracle="""
    SELECT doc_id, CAST(u.pos AS INTEGER) AS pos, u.token AS token,
           CAST(length(u.token) AS INTEGER) AS token_len
    FROM (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, len(string_split(text, ' '))),
               i -> {'pos': i, 'token': string_split(text, ' ')[i]})) AS u
      FROM documents
      WHERE doc_id % 200 = 0
    )
    """,
)
def udtf_tokenize_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function: one row in, N rows out) tokenizing a
    document subset with 1-based positions — the lateral-view shape for
    row-expanding Python logic that built-in generators can't express.
    Oracle-checked against the pure-SQL unnest to prove equivalence; the
    equivalent built-in (posexplode, see array_posexplode) remains the
    hot-path choice."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string, token_len int")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" "), start=1):
                yield i, tok, len(tok)

    spark.udtf.register("tokenize_positions", Tokenize)
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    d.filter(F.col("doc_id") % 200 == 0).createOrReplaceTempView("docs_subset")
    return spark.sql(
        """
        SELECT doc_id, t.pos, t.token, t.token_len
        FROM docs_subset, LATERAL tokenize_positions(text) t
        """
    )


@register(
    "udf_ewma_stateful",
    oracle="""
    WITH RECURSIVE ordered AS (
      SELECT event_id, user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), rec AS (
      SELECT event_id, user_id, rn, value AS ewma
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.event_id, o.user_id, o.rn, 0.3 * o.value + 0.7 * r.ewma
      FROM ordered o JOIN rec r
        ON o.user_id = r.user_id AND o.rn = r.rn + 1
    )
    SELECT event_id, user_id,
           (FLOOR(ewma * 1000000.0 + 0.5) / 1000000.0) AS ewma
    FROM rec
    """,
)
def udf_ewma_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key EWMA (alpha=0.3) over each user's event-time-ordered value
    stream — the canonical ORDER-DEPENDENT stateful computation that no
    window frame can decompose (each output depends on the full prefix
    through a non-associative fold). Engine side: repartition on the key,
    sort within partitions, then ONE mapInPandas pass whose pandas
    groupby(...).ewm(adjust=False) kernel computes every user's
    recurrence in vectorized C — one Python invocation per PARTITION, not
    per key (an applyInPandas draft paid a per-group call for thousands
    of small groups and was ~5× slower at sf0.1). Oracle side: the
    identical recurrence unrolled as a recursive CTE stepping rn→rn+1.

    Determinism contract: pandas ewm(adjust=False) evaluates
    y = (1-a)·y + a·x with the same two products and one IEEE add as the
    explicit fold — verified bit-identical over random data — and both
    sides use the parsed literals 0.3/0.7 (never 1-alpha: the subtraction
    may not equal the parsed literal). The q()-style FLOOR quantization
    at the end is belt-and-suspenders, not a tolerance.

    At 100 TB: one shuffle on the key + a partition-local sort,
    Arrow-batched transfer; hash partitioning keeps every key's history
    in one partition regardless of AQE coalescing. Skewed users remain
    the thing to watch — cap or chunk per-key history upstream (the
    discipline applyInPandasWithState forces via state timeouts)."""
    import numpy as np

    events = load_tables(spark, sf_dir, names=("events",))["events"]

    def ewma_partition(batches):
        pdfs = [b for b in batches]
        if not pdfs:
            return
        # a key's rows can span Arrow batches within the partition — the
        # recurrence needs them contiguous, so fold the partition into one
        # frame (bounded by shuffle-partition size, not table size)
        pdf = pd.concat(pdfs, ignore_index=True)
        # the grouped-ewm C kernel (no per-group Python); its MultiIndex
        # keeps the original row position at level 1 — sort_index on that
        # level restores input order for the aligned output columns
        ew = (
            pdf.groupby("user_id", sort=False)["value"]
            .ewm(alpha=0.3, adjust=False)
            .mean()
            .reset_index(level=0, drop=True)
            .sort_index()
        )
        yield pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "ewma": np.floor(ew.to_numpy() * 1000000.0 + 0.5) / 1000000.0,
            }
        )

    return (
        events.select("event_id", "user_id", "ts", "value")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(ewma_partition, "event_id bigint, user_id bigint, ewma double")
    )


@register(
    "udf_holt_linear_stateful",
    oracle="""
    WITH RECURSIVE ordered AS (
      SELECT event_id, user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), rec AS (
      SELECT event_id, user_id, rn,
             value AS l, CAST(0 AS DOUBLE) AS b
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.event_id, o.user_id, o.rn,
             0.5 * o.value + 0.5 * (r.l + r.b),
             0.3 * ((0.5 * o.value + 0.5 * (r.l + r.b)) - r.l) + 0.7 * r.b
      FROM ordered o JOIN rec r
        ON o.user_id = r.user_id AND o.rn = r.rn + 1
    )
    SELECT event_id, user_id,
           (FLOOR(l * 1000000.0 + 0.5) / 1000000.0) AS level,
           (FLOOR(b * 1000000.0 + 0.5) / 1000000.0) AS trend
    FROM rec
    """,
)
def udf_holt_linear_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (level α=0.5, trend β=0.3) over
    each account's event-time-ordered values — the COUPLED two-state
    recurrence (lₜ depends on bₜ₋₁ and vice versa) that steps beyond
    udf_ewma_stateful's single-state fold; the forecasting backbone for
    per-account spend trajectories.

    Same engine shape as the EWMA: repartition on the key, sort within
    partitions, ONE mapInPandas pass. pandas has no Holt C kernel, so the
    kernel here is an explicit numpy loop over the partition's rows with
    O(1) state per key held in dicts — still one Python call per
    PARTITION, with the loop body a handful of float ops per row.

    Determinism contract: α=0.5 makes both α and 1−α exactly
    representable; β uses the parsed literals 0.3/0.7 on both sides
    (never computing 1−β). The update l' = 0.5·x + 0.5·(l+b);
    b' = 0.3·(l'−l) + 0.7·b is evaluated with the identical op sequence
    in numpy and in the recursive CTE, so the doubles are bit-equal and
    the 1e-6 quantization is belt-and-suspenders.

    At 100 TB: one shuffle + partition-local sort, same skew caveat as
    the EWMA (cap per-key history upstream); state is 2 doubles per key.
    """
    import numpy as np

    events = load_tables(spark, sf_dir, names=("events",))["events"]

    def holt_partition(batches):
        pdfs = [b for b in batches]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        users = pdf["user_id"].to_numpy()
        xs = pdf["value"].to_numpy()
        level = np.empty(len(pdf))
        trend = np.empty(len(pdf))
        lstate: dict[int, float] = {}
        bstate: dict[int, float] = {}
        for i in range(len(pdf)):
            u, x = users[i], xs[i]
            if u not in lstate:
                l_new, b_new = x, 0.0
            else:
                l_prev, b_prev = lstate[u], bstate[u]
                l_new = 0.5 * x + 0.5 * (l_prev + b_prev)
                b_new = 0.3 * (l_new - l_prev) + 0.7 * b_prev
            lstate[u], bstate[u] = l_new, b_new
            level[i], trend[i] = l_new, b_new
        yield pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "level": np.floor(level * 1000000.0 + 0.5) / 1000000.0,
                "trend": np.floor(trend * 1000000.0 + 0.5) / 1000000.0,
            }
        )

    return (
        events.select("event_id", "user_id", "ts", "value")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(
            holt_partition, "event_id bigint, user_id bigint, level double, trend double"
        )
    )


@register(
    "udf_holt_winters_stateful",
    oracle="""
    WITH RECURSIVE ordered AS (
      SELECT event_id, user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), rec AS (
      SELECT event_id, user_id, rn,
             value AS l, CAST(0 AS DOUBLE) AS b,
             CAST(0 AS DOUBLE) AS c0, CAST(0 AS DOUBLE) AS c1,
             CAST(0 AS DOUBLE) AS c2, CAST(0 AS DOUBLE) AS c3,
             CAST(0 AS DOUBLE) AS c_new
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.event_id, o.user_id, o.rn,
             0.5 * (o.value - r.c0) + 0.5 * (r.l + r.b),
             0.3 * ((0.5 * (o.value - r.c0) + 0.5 * (r.l + r.b)) - r.l)
               + 0.7 * r.b,
             r.c1, r.c2, r.c3,
             0.25 * (o.value
                     - (0.5 * (o.value - r.c0) + 0.5 * (r.l + r.b)))
               + 0.75 * r.c0,
             0.25 * (o.value
                     - (0.5 * (o.value - r.c0) + 0.5 * (r.l + r.b)))
               + 0.75 * r.c0
      FROM ordered o JOIN rec r
        ON o.user_id = r.user_id AND o.rn = r.rn + 1
    )
    SELECT event_id, user_id,
           (FLOOR(l * 1000000.0 + 0.5) / 1000000.0) AS level,
           (FLOOR(b * 1000000.0 + 0.5) / 1000000.0) AS trend,
           (FLOOR(c_new * 1000000.0 + 0.5) / 1000000.0) AS seasonal
    FROM rec
    """,
)
def udf_holt_winters_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (triple exponential smoothing, season m=4)
    per account: level, trend AND a rotating 4-slot seasonal queue —
    the coupled nonlinear recurrence no window frame or closed form can
    decompose (CUSUM has one, fraud_cusum_drift; this genuinely doesn't).
    The completion of the smoothing family: EWMA (1 state) → Holt (2) →
    Holt-Winters (2 + m).

    Same engine shape as its siblings: repartition on the key, sort
    within partitions, ONE mapInPandas pass whose kernel is an explicit
    loop with O(m) state per key — per-row Python is the honest cost of a
    recurrence with no pandas C kernel, and it is documented as such (the
    module's only per-row loop).

    Determinism contract: α=0.5 and γ=0.25 are exactly representable
    (so are 1−α, 1−γ); β uses parsed literals 0.3/0.7. The update
    sequence  l' = 0.5·(x−c₀) + 0.5·(l+b);  b' = 0.3·(l'−l) + 0.7·b;
    c' = 0.25·(x−l') + 0.75·c₀  is evaluated with the IDENTICAL op order
    in the loop and in the recursive CTE (whose b'/c' re-inline the l'
    expression — recomputing a deterministic double yields the same
    double), so state stays bit-equal without per-step quantization; the
    final 1e-6 floor is belt-and-suspenders. The seasonal queue rotates
    (c₀←c₁←c₂←c₃←c'), giving each slot exactly period-m reuse.

    At 100 TB: one shuffle + partition-local sort; state is m+2 doubles
    per key; the usual skew caveat (cap per-key history upstream)."""
    import numpy as np

    events = load_tables(spark, sf_dir, names=("events",))["events"]

    def hw_partition(batches):
        pdfs = [b for b in batches]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        users = pdf["user_id"].to_numpy()
        xs = pdf["value"].to_numpy()
        n = len(pdf)
        level = np.empty(n)
        trend = np.empty(n)
        seasonal = np.empty(n)
        state: dict[int, tuple[float, float, list[float]]] = {}
        for i in range(n):
            u, x = users[i], xs[i]
            st = state.get(u)
            if st is None:
                l_new, b_new, c_new = x, 0.0, 0.0
                queue = [0.0, 0.0, 0.0, 0.0]
            else:
                l_prev, b_prev, queue = st
                c0 = queue[0]
                l_new = 0.5 * (x - c0) + 0.5 * (l_prev + b_prev)
                b_new = 0.3 * (l_new - l_prev) + 0.7 * b_prev
                c_new = 0.25 * (x - l_new) + 0.75 * c0
                queue = [queue[1], queue[2], queue[3], c_new]
            state[u] = (l_new, b_new, queue)
            level[i], trend[i], seasonal[i] = l_new, b_new, c_new
        yield pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "level": np.floor(level * 1000000.0 + 0.5) / 1000000.0,
                "trend": np.floor(trend * 1000000.0 + 0.5) / 1000000.0,
                "seasonal": np.floor(seasonal * 1000000.0 + 0.5) / 1000000.0,
            }
        )

    return (
        events.select("event_id", "user_id", "ts", "value")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(
            hw_partition,
            "event_id bigint, user_id bigint, level double, trend double,"
            " seasonal double",
        )
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT vec_id,
           CAST(list_sum(list_transform(embedding,
                x -> CAST(FLOOR(ABS(CAST(x AS DOUBLE)) * 1000000 + 0.5)
                          AS BIGINT))) AS BIGINT) AS l1_micro,
           CAST(len(embedding) AS BIGINT) AS dim
    FROM embeddings
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow (r8): the LOWEST-overhead Python surface — the function
    receives raw pyarrow RecordBatches, no pandas conversion at all, so
    list columns stay zero-copy Arrow arrays end to end. Completes the
    sanctioned-UDF matrix (pandas_udf / UDTF / applyInPandas /
    mapInPandas / applyInPandasWithState / mapInArrow). Per-vector L1
    norm with per-ELEMENT micro-unit quantization before the sum —
    order-free integer arithmetic, so the DuckDB list-fold oracle
    matches exactly (same rule as the text/graph integer sums). The
    numpy kernel works on the flattened values buffer + offsets, the
    shape a real vector pipeline uses at scale (no per-row Python)."""
    import numpy as np
    import pyarrow as pa

    e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]

    def l1_batches(batches):
        for batch in batches:
            ids = batch.column("vec_id")
            emb = batch.column("embedding")
            if isinstance(emb, pa.ChunkedArray):  # defensive; batches are flat
                emb = emb.combine_chunks()
            flat = np.abs(emb.values.to_numpy(zero_copy_only=False).astype(np.float64))
            micro = np.floor(flat * 1_000_000 + 0.5).astype(np.int64)
            offs = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            csum = np.concatenate([[0], np.cumsum(micro)])
            l1 = csum[offs[1:]] - csum[offs[:-1]]
            dim = offs[1:] - offs[:-1]
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(l1), pa.array(dim)],
                names=["vec_id", "l1_micro", "dim"],
            )

    return fan_out(e).select("vec_id", "embedding").mapInArrow(
        l1_batches, schema="vec_id bigint, l1_micro bigint, dim bigint"
    )
