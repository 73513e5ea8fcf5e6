"""Training-corpus curation operators: decontamination, repetition
detection, PII scrubbing, source-weighted mixing, shard assignment.

The reference has no corpus tooling at all (its data prep is one CSV read,
fraud_detection_model.py:76); these are the operations a 100 TB pretraining
pipeline runs between raw crawl and tokenizer, expressed as pure built-in
DataFrame plans (JVM-side, codegen — no Python in any hot path) with DuckDB
oracle twins.

Scale posture per operator:
- decontamination: the benchmark side is tiny by construction (eval sets
  are MBs, the corpus is TBs) → broadcast the benchmark shingles; the
  corpus-side shingle expansion is map-only, so the whole check is one
  broadcast hash join + partial agg, no corpus shuffle. The shared
  doc-frequency cap from dedup.py drops stop-shingles before the join —
  the same skew guard, and it removes exactly the n-grams that would
  false-positive ("the of and ...").
- repetition ratio: two cascaded aggregates with map-side combine; the
  (doc, token) key is high-cardinality so no skew.
- PII scrub: per-row regexp, embarrassingly parallel, zero shuffles.
- mix sampling: per-row multiplicative-hash gate, zero shuffles before the
  per-source count agg. The hash is plain 64-bit arithmetic (identical in
  any engine) — NOT rand(): resampling the same corpus twice must keep the
  same rows for reproducible data lineage.
- shard assignment: per-row hash, one partial agg; at production scale the
  same expression feeds partitionBy at write time so each shard is one
  file set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import q, q_sql
from ..plans.registry import register
from ..sources.tables import fan_out, load_tables
from .dedup import MAX_DOC_FREQ, _SHINGLES_SQL, _shingles_spark

# Deterministic "benchmark" slice standing in for an eval set: every 97th doc.
_BENCH_MOD = 97
# Multiplicative hash (Knuth): 64-bit-safe for doc_id < 2^31.
_HASH_PRIME = 2654435761
_N_SHARDS = 16
# Per-source sampling rates for the data-mix (default 35%).
_MIX_RATES = {"src0": 1.0, "src1": 0.75, "src2": 0.5, "src3": 0.25, "src4": 0.1}
_MIX_DEFAULT = 0.35


@register(
    "curation_decontaminate",
    oracle=f"""
    WITH shingles AS ({_SHINGLES_SQL}),
    hot AS (
      SELECT shingle FROM shingles GROUP BY shingle HAVING COUNT(*) > {MAX_DOC_FREQ}
    ),
    filtered AS (
      SELECT * FROM shingles WHERE shingle NOT IN (SELECT shingle FROM hot)
    ),
    bench AS (
      SELECT DISTINCT shingle FROM filtered WHERE doc_id % {_BENCH_MOD} = 0
    )
    SELECT f.doc_id,
           COUNT(*) AS n_hit_shingles
    FROM filtered f JOIN bench b ON f.shingle = b.shingle
    WHERE f.doc_id % {_BENCH_MOD} <> 0
    GROUP BY f.doc_id
    """,
)
def curation_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination: flag training documents that share any
    word-3-shingle with the benchmark slice (doc_id % 97 == 0), reporting
    how many distinct shingles leak. The benchmark shingle set broadcasts;
    the corpus side never shuffles before its per-doc count."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    # persist the shared subtrees: `filtered` feeds both the broadcast
    # bench side and the train side, `sh` feeds hot + filtered — uncached
    # plans re-run the shingle pipeline once per consumer (guide §5).
    sh = _shingles_spark(d).persist()
    hot = sh.groupBy("shingle").count().filter(F.col("count") > MAX_DOC_FREQ).select("shingle")
    filtered = sh.join(F.broadcast(hot), "shingle", "left_anti").persist()
    bench = (
        filtered.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select("shingle")
        .distinct()
    )
    # (doc_id, shingle) pairs are already distinct (per-doc array_distinct
    # before the explode) and bench is distinct, so a plain COUNT(*) equals
    # COUNT(DISTINCT shingle) without the expand+dedup shuffle the latter
    # would plan.
    return (
        filtered.filter(F.col("doc_id") % _BENCH_MOD != 0)
        .join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit_shingles"))
    )


@register(
    "curation_repetition_ratio",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    counts AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(MAX(c) AS BIGINT) AS max_token_freq,
           {q_sql("CAST(MAX(c) AS DOUBLE) / SUM(c)")} AS rep_ratio,
           CASE WHEN CAST(MAX(c) AS DOUBLE) / SUM(c) > 0.1 THEN 1 ELSE 0 END
             AS is_repetitive
    FROM counts GROUP BY doc_id
    """,
)
def curation_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition filter (Gopher-style quality rule): fraction of the
    document occupied by its single most frequent token; >10% flags the doc.
    Cascaded aggregates, both with map-side combine; only counts are
    emitted (never the argmax token — ties would be non-deterministic)."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    counts = (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    ratio = F.max("c").cast("double") / F.sum("c")
    return counts.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.max("c").cast("bigint").alias("max_token_freq"),
        q(ratio).alias("rep_ratio"),
        F.when(ratio > 0.1, 1).otherwise(0).alias("is_repetitive"),
    )


@register(
    "curation_pii_scrub",
    oracle="""
    SELECT event_id,
           CAST(len(regexp_extract_all(props, '[0-9]+')) AS INTEGER)
             AS n_redactions,
           md5(regexp_replace(props, '[0-9]+', '<NUM>', 'g')) AS scrubbed_hash
    FROM events
    """,
)
def curation_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style scrubbing over the raw payload column: every digit run
    (IDs, phone numbers, account numbers) becomes a `<NUM>` placeholder.
    Per-row regexp only — zero shuffles, scales linearly. The scrubbed
    output is reported as an md5 so the oracle checks redacted CONTENT,
    not just counts. (Real pipelines add email/SSN patterns to the same
    single-pass alternation; one regex pass, not one per pattern.)"""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    return ev.select(
        "event_id",
        F.size(F.regexp_extract_all("props", F.lit("[0-9]+"), F.lit(0))).alias("n_redactions"),
        F.md5(F.regexp_replace("props", "[0-9]+", "<NUM>")).alias("scrubbed_hash"),
    )


def _mix_rate_sql() -> str:
    cases = " ".join(
        f"WHEN source = '{s}' THEN {r}" for s, r in sorted(_MIX_RATES.items())
    )
    return f"CASE {cases} ELSE {_MIX_DEFAULT} END"


def _mix_rate_spark() -> F.Column:
    col = F
    expr = None
    for s, r in sorted(_MIX_RATES.items()):
        expr = (
            F.when(F.col("source") == s, F.lit(r))
            if expr is None
            else expr.when(F.col("source") == s, F.lit(r))
        )
    return expr.otherwise(F.lit(_MIX_DEFAULT))


@register(
    "curation_mix_weighted_sample",
    oracle=f"""
    WITH gated AS (
      SELECT source,
             CASE WHEN (doc_id * {_HASH_PRIME}) % 1000 < ({_mix_rate_sql()}) * 1000
                  THEN 1 ELSE 0 END AS kept
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_total,
           CAST(SUM(kept) AS BIGINT) AS n_kept,
           {q_sql("CAST(SUM(kept) AS DOUBLE) / COUNT(*)")} AS realized_rate
    FROM gated GROUP BY source
    """,
)
def curation_mix_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-weighted data mixing: each source keeps a configured fraction
    of its documents (upsampling curated sources, downsampling crawl) via a
    deterministic multiplicative-hash gate on doc_id — reproducible
    lineage, unlike rand()-based sampling, and identical arithmetic in any
    engine. Zero shuffles before the per-source audit aggregate."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    kept = F.when(
        (F.col("doc_id") * _HASH_PRIME) % 1000 < _mix_rate_spark() * 1000, 1
    ).otherwise(0)
    gated = d.select("source", kept.alias("kept"))
    return gated.groupBy("source").agg(
        F.count("*").alias("n_total"),
        F.sum("kept").cast("bigint").alias("n_kept"),
        q(F.sum("kept").cast("double") / F.count("*")).alias("realized_rate"),
    )


@register(
    "curation_shard_assignment",
    oracle=f"""
    WITH assigned AS (
      SELECT (doc_id * {_HASH_PRIME}) % {_N_SHARDS} AS shard,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
    FROM assigned GROUP BY shard
    """,
)
def curation_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic resharding for training: multiplicative hash of
    doc_id -> one of 16 shards, audited by per-shard doc and token totals
    (the test asserts balance). At write time the same expression is the
    partitionBy key, so every training shard lands as one file set with no
    extra shuffle beyond the write's own exchange."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    assigned = d.select(
        ((F.col("doc_id") * _HASH_PRIME) % _N_SHARDS).cast("bigint").alias("shard"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    return assigned.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("shard_tokens"),
    )


# The CC subquery reuses the registered LSH-pairs oracle (same pattern as
# dedup_cluster_keep_canonical); .format splices it plus the threshold.
_LEAKAGE_ORACLE = """
    WITH cc AS (
      SELECT doc_id, cluster_id FROM (
        WITH RECURSIVE
        cand AS (
          SELECT doc_a, doc_b FROM ({lsh}) WHERE est_jaccard >= {thr}
        ),
        edges AS (
          SELECT doc_a AS s, doc_b AS t FROM cand
          UNION ALL
          SELECT doc_b, doc_a FROM cand
        ),
        nodes AS (SELECT DISTINCT s AS node FROM edges),
        reach(node, lbl) AS (
          SELECT node, node FROM nodes
          UNION
          SELECT e.t, r.lbl FROM reach r JOIN edges e ON e.s = r.node
          WHERE r.lbl < e.t
        )
        SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node
      )
    ),
    assigned AS (
      SELECT d.doc_id,
             COALESCE(cc.cluster_id, d.doc_id) AS cluster_id,
             CASE WHEN md5(CAST(COALESCE(cc.cluster_id, d.doc_id) AS VARCHAR))
                       < '19999999999999999999999999999999' THEN 'validation'
                  WHEN md5(CAST(COALESCE(cc.cluster_id, d.doc_id) AS VARCHAR))
                       < '33333333333333333333333333333333' THEN 'test'
                  ELSE 'train' END AS split
      FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters
    FROM assigned GROUP BY split
    """


from ..plans.registry import ORACLE as _REGISTERED_ORACLE  # noqa: E402
from .dedup import _CC_THRESHOLD  # noqa: E402


@register(
    "curation_leakage_safe_split",
    oracle=_LEAKAGE_ORACLE.format(
        lsh=_REGISTERED_ORACLE["dedup_minhash_lsh_pairs"], thr=_CC_THRESHOLD
    ),
)
def curation_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/validation/test split: the split key is the
    document's NEAR-DUP CLUSTER id (LSH → connected components; singleton
    docs are their own cluster), hashed with the same md5-hex boundaries
    as split_by_hash. Splitting by doc_id lets near-duplicates of a
    training doc land in the eval split — the classic train/test
    contamination channel; hashing the cluster id pins every member of a
    cluster to the SAME split by construction. Reports per-split document
    and cluster counts.

    Scale posture: the CC label table is pair-participant-sized (≪ corpus)
    and joins LEFT onto documents without a hint (AQE broadcasts while it
    fits — same rationale as dedup_cluster_keep_canonical); everything
    after the join is one partial-agg pass. At 100 TB the cluster ids
    would be materialized once per dedup run and reused by every split."""
    from .dedup import dedup_cluster_connected_components

    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    cc = dedup_cluster_connected_components(spark, sf_dir)
    cluster = F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    h = F.md5(cluster.cast("string"))
    split = (
        F.when(h < "19999999999999999999999999999999", "validation")
        .when(h < "33333333333333333333333333333333", "test")
        .otherwise("train")
    )
    return (
        docs.select("doc_id")
        .join(cc, "doc_id", "left")
        .select(split.alias("split"), cluster.alias("cluster_id"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("cluster_id").cast("long").alias("n_clusters"),
        )
    )


@register(
    "curation_perplexity_filter",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    n AS (SELECT COUNT(*) AS n_total FROM toks),
    vocab AS (
      SELECT term,
             CAST(FLOOR(-LN(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(n.n_total))
                        * 1000000.0 + 0.5) AS BIGINT) AS lq
      FROM toks CROSS JOIN n
      GROUP BY term
    ),
    scored AS (
      SELECT t.doc_id,
             CAST(SUM(v.lq) AS DOUBLE) / (COUNT(*) * 1000000.0) AS s
      FROM toks t JOIN vocab v USING (term)
      GROUP BY t.doc_id
    ),
    ranked AS (
      SELECT doc_id, s, NTILE(10) OVER (ORDER BY s, doc_id) AS decile
      FROM scored
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           (FLOOR(MIN(s) * 10000.0 + 0.5) / 10000.0) AS min_score,
           (FLOOR(MAX(s) * 10000.0 + 0.5) / 10000.0) AS max_score,
           CASE WHEN decile = 1 OR decile = 10 THEN 'drop' ELSE 'keep' END AS action
    FROM ranked GROUP BY decile
    """,
)
def curation_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-band filtering (the CCNet recipe): score every document
    with the corpus-unigram avg-neg-logprob (integer micro-nat sums, see
    text_unigram_logprob), cut the corpus into exact score deciles, and
    drop both tails — decile 1 (degenerate repetition scores near zero)
    and decile 10 (gibberish/OCR noise scores highest). Reports per-decile
    document counts, score bounds, and the keep/drop decision.

    NTILE over (score, doc_id) is a total order, so decile assignment is
    deterministic cross-engine. Scale note: the global NTILE sorts the
    PER-DOCUMENT score table (one row per doc — orders of magnitude
    smaller than the token stream, but still a single-partition window at
    Spark's default). At 100 TB the same result comes from computing the
    9 decile boundaries once (exact via two-pass count/offset, or
    percentile_approx when ±ε is acceptable) and bucketing map-side; the
    decile SEMANTICS pinned here are what that optimization must
    preserve."""
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    totals = toks.agg(F.count("*").alias("n_total"))
    vocab = (
        toks.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(totals))
        .select(
            "term",
            F.floor(
                -F.log(F.col("cnt").cast("double") / F.col("n_total")) * 1_000_000.0
                + 0.5
            )
            .cast("bigint")
            .alias("lq"),
        )
    )
    scored = (
        toks.join(vocab, "term")
        .groupBy("doc_id")
        .agg(
            (
                F.sum("lq").cast("double") / (F.count("*") * 1_000_000.0)
            ).alias("s")
        )
    )
    from pyspark.sql import Window as W

    ranked = scored.withColumn(
        "decile", F.ntile(10).over(W.orderBy("s", "doc_id")).cast("long")
    )
    action = F.when(F.col("decile").isin(1, 10), "drop").otherwise("keep")
    return ranked.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_docs"),
        q(F.min("s")).alias("min_score"),
        q(F.max("s")).alias("max_score"),
        F.max(action).alias("action"),
    )


@register(
    "curation_dup_rate_by_source",
    oracle="""
    WITH hashed AS (
      SELECT source, md5(text) AS h FROM documents
    ), per_hash AS (
      SELECT source, h, CAST(COUNT(*) AS BIGINT) AS n
      FROM hashed GROUP BY source, h
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_unique,
           CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dup_docs,
           CAST(FLOOR((SUM(n) - COUNT(*)) * 1000000.0 / SUM(n) + 0.5) AS BIGINT)
             AS dup_rate_micro
    FROM per_hash GROUP BY source
    """,
)
def curation_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate rate report — the curation dashboard
    line that catches a scraper re-crawling the same pages (one source's
    dup rate spiking while others hold). Two stacked map-side-combinable
    aggregates on (source, content-hash) then (source); the content hash
    means the shuffle carries 32-byte digests, never document text.
    The rate is integer-derived and floor-quantized. Companion to the
    corpus-wide dedup_exact (which deduplicates; this MEASURES, per
    source, feeding curation_mix_weighted_sample's weights)."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    per_hash = d.select("source", F.md5("text").alias("h")).groupBy(
        "source", "h"
    ).agg(F.count("*").cast("bigint").alias("n"))
    return per_hash.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_unique"),
        (F.sum("n") - F.count("*")).cast("bigint").alias("n_dup_docs"),
        F.floor(
            (F.sum("n") - F.count("*")) * 1_000_000.0 / F.sum("n") + 0.5
        )
        .cast("bigint")
        .alias("dup_rate_micro"),
    )


@register(
    "curation_quota_sample",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rk
      FROM documents
    )
    SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 5
    """,
)
def curation_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-source quota sampling (5 docs per source), deterministic:
    rank by the md5 of the key and keep the first N — the quota-exact
    complement of curation_mix_weighted_sample's probabilistic weights
    (Bernoulli gives you the mix in expectation; a benchmark slice or
    labeling batch needs EXACTLY N per stratum, reproducibly). Hash-order
    ranking is unbiased w.r.t. any data attribute, stable across reruns,
    engines, and cluster sizes, and joinable back by key. One shuffle on
    source; the rank filter compiles to WindowGroupLimit, so each
    partition ships at most N rows per stratum at 100 TB."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    from pyspark.sql import Window
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= 5)
    )


_DBLOOM_BITS = 1 << 16   # 64 Kbit bitmap = 1024 longs, 4 KiB collected
_DBLOOM_WORDS = _DBLOOM_BITS // 64
_DBLOOM_SEEDS = (11, 23, 37)


@register(
    "curation_decontaminate_bloom",
    oracle=f"""
    WITH shingles AS ({_SHINGLES_SQL}),
    hot AS (
      SELECT shingle FROM shingles GROUP BY shingle HAVING COUNT(*) > {MAX_DOC_FREQ}
    ),
    filtered AS (
      SELECT * FROM shingles WHERE shingle NOT IN (SELECT shingle FROM hot)
    ),
    bench AS (
      SELECT DISTINCT shingle FROM filtered WHERE doc_id % {_BENCH_MOD} = 0
    )
    SELECT f.doc_id,
           COUNT(*) AS n_hit_shingles
    FROM filtered f JOIN bench b ON f.shingle = b.shingle
    WHERE f.doc_id % {_BENCH_MOD} <> 0
    GROUP BY f.doc_id
    """,
)
def curation_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage benchmark decontamination — the shape the screen takes at
    100 TB: stage 1 hashes the benchmark shingle set into a 64 Kbit Bloom
    bitmap (built distributedly as 1024 OR-aggregated longs, collected as
    a fixed 4 KiB literal regardless of corpus size) and drops every
    corpus shingle that misses any of the 3 bits AT THE SCAN — no join,
    no shuffle, just bitwise tests in whole-stage codegen; stage 2
    exact-joins only the survivors against the benchmark set to eliminate
    Bloom false positives. No false negatives (Bloom guarantee) means the
    result — and the oracle, which is the single-stage exact logic of
    curation_decontaminate — is IDENTICAL; the bitmap is semantics-
    neutral, like join_skew_salted's salt. What changes at scale is the
    join input: the shuffle carries only shingles that (probably) leak,
    a tiny fraction of the corpus, instead of every (doc, shingle) pair.
    Size the bitmap for the benchmark's shingle cardinality to hold the
    FPR (the benchmark side is the small, bounded one by construction —
    that is exactly why it blooms well)."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    # persist the shared shingle subtrees: `filtered` feeds the bitmap
    # build (collected eagerly below), the stage-2 broadcast side AND the
    # train side — uncached it re-runs the shingle+hot pipeline once per
    # consumer (guide §5); `sh` itself has two consumers (hot, filtered).
    sh = _shingles_spark(d).persist()
    hot = (
        sh.groupBy("shingle").count().filter(F.col("count") > MAX_DOC_FREQ).select("shingle")
    )
    filtered = sh.join(F.broadcast(hot), "shingle", "left_anti").persist()
    bench = (
        filtered.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select("shingle")
        .distinct()
    )

    def positions(key: F.Column) -> list[F.Column]:
        return [
            F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(_DBLOOM_BITS))
            for seed in _DBLOOM_SEEDS
        ]

    words = (
        bench.select(F.explode(F.array(*positions(F.col("shingle")))).alias("pos"))
        .select(
            F.floor(F.col("pos") / 64).cast("int").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    bitmap = [0] * _DBLOOM_WORDS
    for r in words:
        bitmap[r["w"]] = r["bits"]
    # ONE parsed expression, not 1024 py4j lit().cast() round trips
    # (same measured ~2.7 s -> ~4 ms driver-side win as
    # join_bloom_filter_pruned)
    lit_bitmap = F.expr("array(" + ",".join(f"{b}L" for b in bitmap) + ")")

    train = filtered.filter(F.col("doc_id") % _BENCH_MOD != 0).withColumn(
        "_bm", lit_bitmap
    )
    for i, p in enumerate(positions(F.col("shingle"))):
        train = train.withColumn(f"_p{i}", p)
    tests = [
        f"(element_at(_bm, CAST(FLOOR(_p{i} / 64) AS INT) + 1)"
        f" & shiftleft(CAST(1 AS BIGINT), CAST(_p{i} % 64 AS INT))) != 0"
        for i in range(len(_DBLOOM_SEEDS))
    ]
    survivors = train.where(F.expr(" AND ".join(tests))).drop(
        "_bm", *[f"_p{i}" for i in range(len(_DBLOOM_SEEDS))]
    )
    return (
        survivors.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit_shingles"))
    )


@register(
    "curation_template_skeletons",
    oracle="""
    WITH sk AS (
      SELECT doc_id, source,
             md5(array_to_string(list_transform(string_split(text, ' '),
                                                t -> CAST(len(t) AS VARCHAR)),
                                 ',')) AS skeleton
      FROM documents
    ),
    per AS (
      SELECT skeleton,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(MIN(doc_id) AS BIGINT) AS example_doc
      FROM sk GROUP BY skeleton
    )
    SELECT skeleton, n_docs, n_sources, example_doc
    FROM per
    ORDER BY n_docs DESC, skeleton
    LIMIT 10
    """,
)
def curation_template_skeletons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template/boilerplate detection by STRUCTURAL fingerprint: each
    document collapses to the md5 of its token-length sequence — a
    shape-hash that is invariant to which words fill the slots but not to
    the template's structure — and the report surfaces the 10 most
    repeated skeletons with doc counts and source spread. Generated
    boilerplate (cookie banners, scraper chrome, form letters) shares a
    skeleton across thousands of pages while organic text almost never
    collides; cross-source skeletons (n_sources high) are the strongest
    boilerplate signal, feeding the removal pass exact-dedup cannot do
    (the filled-in words differ) and MinHash handles poorly (lexical
    overlap may be low while structure is identical).

    One map-side skeleton hash per doc (no shuffle carries text — 32-byte
    digests only), two stacked combinable aggregates, top-10 via
    TakeOrderedAndProject. The length-sequence skeleton is the cheapest
    member of the family; swapping in a rare-word-masked skeleton changes
    one per-row expression, not the plan."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    skeleton = F.md5(
        F.concat_ws(
            ",",
            F.transform(F.split(F.col("text"), " "), lambda t: F.length(t).cast("string")),
        )
    )
    per = (
        d.select("doc_id", "source", skeleton.alias("skeleton"))
        .groupBy("skeleton")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_distinct("source").cast("bigint").alias("n_sources"),
            F.min("doc_id").cast("bigint").alias("example_doc"),
        )
    )
    return per.orderBy(F.desc("n_docs"), "skeleton").limit(10)


_HEX = "0123456789abcdef"
_DSIR_BUCKETS = 16


@register(
    "curation_dsir_importance",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
      FROM documents
    ),
    tok2 AS (
      SELECT doc_id, word,
             (instr('{_HEX}', substring(md5(word), 1, 1)) - 1)
               % {_DSIR_BUCKETS} AS bucket
      FROM toks WHERE word <> ''
    ),
    bc AS (
      SELECT bucket,
             SUM(CASE WHEN doc_id % {_BENCH_MOD} = 0 THEN 1 ELSE 0 END) AS c_t,
             SUM(CASE WHEN doc_id % {_BENCH_MOD} <> 0 THEN 1 ELSE 0 END) AS c_r
      FROM tok2 GROUP BY bucket
    ),
    tot AS (SELECT SUM(c_t) AS n_t, SUM(c_r) AS n_r FROM bc),
    w AS (
      SELECT bucket,
             CAST(FLOOR(1000000.0 * (LN(c_t + 1.0) - LN(n_t + {_DSIR_BUCKETS}.0)
                                     - LN(c_r + 1.0) + LN(n_r + {_DSIR_BUCKETS}.0))
                        + 0.5) AS BIGINT) AS w_micro
      FROM bc CROSS JOIN tot
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(w.w_micro) AS BIGINT) AS logratio_micro,
           (SUM(w.w_micro) > 0) AS selected
    FROM tok2 t JOIN w ON w.bucket = t.bucket
    WHERE t.doc_id % {_BENCH_MOD} <> 0
    GROUP BY t.doc_id
    """,
)
def curation_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169 —
    Data Selection via Importance Resampling): score every raw document
    by the log-likelihood ratio of a TARGET-domain hashed-n-gram bag-of-
    words model over a RAW-corpus model, Σ_tokens [log p_t(h(tok)) −
    log p_r(h(tok))] with add-one smoothing. The target slice is the
    deterministic benchmark stand-in (doc_id % 97 == 0, shared with
    curation_decontaminate); features are md5-first-nibble hash buckets —
    the SAME stateless cross-engine hash as text_hashing_trick_tf, which
    is the paper's point: no vocabulary, no fit artifact, composes with
    any partitioning.

    Scale posture: the two LMs together are ONE 16-row table — a
    groupBy(bucket) with full map-side combine over the token stream,
    then the per-bucket log-ratio is quantized to integer micros and
    joined back broadcast-style (bucket count is a compile-time
    constant), so the per-doc score is an order-free BIGINT sum: one
    token-explode pass, one doc-cardinality shuffle, and the corpus
    never moves for the model build. `selected` (ratio > 0) is the
    paper's resampling gate; downstream the weight feeds the existing
    curation_mix machinery."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).where(F.col("word") != "")
    bucket = (
        F.instr(F.lit(_HEX), F.substring(F.md5("word"), 1, 1)) - 1
    ) % _DSIR_BUCKETS
    tok2 = toks.select("doc_id", bucket.alias("bucket"))
    is_target = F.col("doc_id") % _BENCH_MOD == 0
    bc = tok2.groupBy("bucket").agg(
        F.sum(F.when(is_target, 1).otherwise(0)).alias("c_t"),
        F.sum(F.when(~is_target, 1).otherwise(0)).alias("c_r"),
    )
    tot = bc.agg(
        F.sum("c_t").alias("n_t"), F.sum("c_r").alias("n_r")
    )
    w_micro = F.floor(
        1_000_000.0
        * (
            F.log(F.col("c_t") + 1.0)
            - F.log(F.col("n_t") + float(_DSIR_BUCKETS))
            - F.log(F.col("c_r") + 1.0)
            + F.log(F.col("n_r") + float(_DSIR_BUCKETS))
        )
        + 0.5
    ).cast("bigint")
    w = bc.crossJoin(F.broadcast(tot)).select("bucket", w_micro.alias("w_micro"))
    return (
        tok2.filter(~is_target)
        .join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("w_micro").cast("bigint").alias("logratio_micro"),
            (F.sum("w_micro") > 0).alias("selected"),
        )
    )


@register(
    "curation_epoch_shuffle_order",
    oracle="""
    WITH epochs AS (SELECT * FROM (VALUES (0), (1)) AS e(epoch)),
    permuted AS (
      SELECT e.epoch, d.doc_id,
             CAST((d.doc_id * (48271 + 69621 * e.epoch) + 12345 * (e.epoch + 1))
                  % 15485863 AS BIGINT) AS perm_key
      FROM documents d CROSS JOIN epochs e
    ), ranked AS (
      SELECT epoch, doc_id, perm_key,
             ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY perm_key, doc_id) AS pos
      FROM permuted
    )
    SELECT CAST(epoch AS INTEGER) AS epoch,
           CAST(pos AS BIGINT) AS pos,
           doc_id, perm_key
    FROM ranked WHERE pos <= 10
    """,
)
def curation_epoch_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle — the data-loader primitive every
    large-scale training run needs: a reproducible pseudo-random visit
    order per epoch WITHOUT materializing a shuffled copy of the corpus
    (the trick streaming-dataset loaders use: rank docs by an affine
    permutation key (a_e·doc_id + b_e) mod P, P prime > corpus size, so
    the map is injective and the 'shuffle' is just a sort key — resumable
    from any position, identical on every worker, no RNG state). Two
    epochs with different multipliers demonstrate order independence; the
    query returns each epoch's first 10 positions. Scale: the top-k per
    epoch is a WindowGroupLimit partial cut — at most 10 rows per
    partition reach the epoch shuffle; the corpus itself never moves.
    P = 15485863 (the 10^6-th prime) exceeds doc_id at every test SF, so
    the permutation is injective here; for corpora beyond P, perm_key
    collisions merely degrade shuffle quality — they can no longer
    destabilize the result, because the rank orders by (perm_key,
    doc_id) on BOTH engines (r9 ADVICE: the bare perm_key order made
    row_number nondeterministic past P with no runtime signal)."""
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    epochs = spark.range(2).select(F.col("id").cast("int").alias("epoch"))
    perm = (
        F.col("doc_id") * (F.lit(48271) + F.lit(69621) * F.col("epoch"))
        + F.lit(12345) * (F.col("epoch") + 1)
    ) % F.lit(15485863)
    permuted = docs.select("doc_id").crossJoin(F.broadcast(epochs)).select(
        "epoch", "doc_id", perm.cast("bigint").alias("perm_key")
    )
    w = Window.partitionBy("epoch").orderBy("perm_key", "doc_id")
    return (
        permuted.withColumn("pos", F.row_number().over(w).cast("bigint"))
        .filter(F.col("pos") <= 10)
        .select("epoch", "pos", "doc_id", "perm_key")
    )


# --- GPT-3-style n-gram decontamination (overlap fractions) -----------------

# Gram order for the overlap decontamination below. GPT-3 (arXiv:2005.14165,
# Appendix C) used 13-gram collisions against its eval sets; this corpus's
# documents are 25-80 tokens drawn from a ~30-word vocabulary, so 13-grams
# (and even 6-grams) never collide across the bench/train boundary — the
# probe that picked this value measured 0 hits at k>=6 and a stable,
# SF-growing hit set at k=4 (8 docs at sf0.001, 727 at sf0.1). The gram
# order is the corpus-tuned dial; the machinery is the paper's.
_OVERLAP_K = 4


def _kgram_array_from(tok_col: str, k: int) -> F.Column:
    """Distinct word-k-grams of a pre-split token-array column. Taking the
    already-materialized token column (not re-splitting `text` inline)
    keeps the k element_at references from each inlining their own copy of
    the split under CollapseProject."""
    toks = F.col(tok_col)
    grams = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(k)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


_KGRAMS_SQL = f"""
    SELECT doc_id, source, len(gs) AS n_grams, unnest(gs) AS g
    FROM (
      SELECT doc_id, source,
             list_distinct(
               CASE WHEN len(l) >= {_OVERLAP_K}
                    THEN list_transform(
                           generate_series(1, len(l) - {_OVERLAP_K - 1}),
                           i -> list_aggregate(l[i:i+{_OVERLAP_K - 1}],
                                               'string_agg', ' '))
                    ELSE [] END) AS gs
      FROM (SELECT doc_id, source, string_split(text, ' ') AS l
            FROM documents)
    )
"""


@register(
    "curation_decontaminate_overlap",
    oracle=f"""
    WITH grams AS ({_KGRAMS_SQL}),
    bench AS (
      SELECT DISTINCT g FROM grams WHERE doc_id % {_BENCH_MOD} = 0
    )
    SELECT t.doc_id,
           MIN(t.source) AS source,
           CAST(MIN(t.n_grams) AS BIGINT) AS n_grams,
           COUNT(*) AS n_dirty,
           CAST(FLOOR(COUNT(*) * 1000000.0 / MIN(t.n_grams)) AS BIGINT)
             AS dirty_micro
    FROM grams t JOIN bench b ON t.g = b.g
    WHERE t.doc_id % {_BENCH_MOD} <> 0
    GROUP BY t.doc_id
    """,
)
def curation_decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style n-gram decontamination with overlap FRACTIONS (Brown et
    al. 2020, arXiv:2005.14165 Appendix C): a training document is
    contaminated when any of its word-k-grams (k=4 here, _OVERLAP_K; the
    paper's 13 is vacuous on this short-doc small-vocab corpus — see
    _OVERLAP_K) appears in the benchmark slice (doc_id % 97 == 0), and the
    DEGREE of contamination is the fraction of the doc's distinct k-grams
    that leak — the dirtiness score the paper's appendix ranks cleaned
    evals by. Complements `curation_decontaminate` (3-shingle hit COUNTS)
    with the verdict-grade fraction in exact integer micro units
    (floor(n_dirty*1e6/n_grams) — no float ratio crosses the engine
    boundary).

    Scale posture: the bench gram set is eval-sized by construction (a
    fixed benchmark, not a corpus-growing slice) and broadcasts; the
    corpus side is a scan → per-doc gram expansion → broadcast inner join
    → one groupBy(doc_id) of pre-distinct (doc, gram) rows, so no
    count-distinct Expand and no all-pairs anything. A hot k-gram fans out
    only to the docs that contain it (semi-join-like, never doc×doc).

    Plan shape — a MEASURED lesson (r10): with a plain `explode`,
    InferFiltersFromGenerate synthesizes `size(gs) > 0 AND isnotnull(gs)`
    and predicate pushdown carries it below the fan-out exchange into the
    single-task scan stage — where the filter RE-EVALUATES the whole
    nested gram transform (with `split(text)` inlined once per element_at)
    per row on one core: 9-12 s at sf0.1 for a ~0.5 s job, 20x the honest
    cost. `explode_outer` is outside that rule's scope, so the expansion
    runs once, 32-way, above the exchange; the NULL rows it adds for
    empty gram arrays (docs shorter than k) are dropped by a cheap filter
    on the generate OUTPUT. Same rows, same oracle, 20x the speed."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    base = fan_out(
        d.select("doc_id", "source", F.split(F.col("text"), " ").alias("t"))
    ).select("doc_id", "source", _kgram_array_from("t", _OVERLAP_K).alias("gs"))
    # persisted: `grams` feeds both the bench side (broadcast) and the
    # train side — uncached, the fan-out + gram expansion runs twice
    # (guide §5).
    grams = base.select(
        "doc_id",
        "source",
        F.size("gs").cast("bigint").alias("n_grams"),
        F.explode_outer("gs").alias("g"),
    ).filter(F.col("g").isNotNull()).persist()
    bench = (
        grams.filter(F.col("doc_id") % _BENCH_MOD == 0).select("g").distinct()
    )
    hits = (
        grams.filter(F.col("doc_id") % _BENCH_MOD != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(
            F.min("source").alias("source"),
            F.min("n_grams").cast("bigint").alias("n_grams"),
            F.count("*").alias("n_dirty"),
        )
    )
    return hits.select(
        "doc_id",
        "source",
        "n_grams",
        "n_dirty",
        F.floor(F.col("n_dirty") * 1000000.0 / F.col("n_grams"))
        .cast("bigint")
        .alias("dirty_micro"),
    )


# --- temperature-based domain mixing (XLM-R alpha-sampling) -----------------


def isqrt_case_sql(col: str) -> str:
    """Bracket-corrected BIGINT integer square root as portable SQL:
    s = floor(sqrt(n)) nudged so s*s <= n < (s+1)^2 exactly, even in the
    perfect-square neighborhoods where a bare double sqrt is one ulp off.
    THE single copy — the temperature-mix oracle AND
    tests/test_curation_props.py build from it, so the operator formula
    and the property test can never validate different expressions."""
    f = f"FLOOR(SQRT(CAST({col} AS DOUBLE)))"
    return f"""CAST(
               CASE
                 WHEN CAST({f} AS BIGINT) * CAST({f} AS BIGINT) > {col}
                 THEN {f} - 1
                 WHEN (CAST({f} AS BIGINT) + 1) * (CAST({f} AS BIGINT) + 1)
                      <= {col}
                 THEN {f} + 1
                 ELSE {f}
               END AS BIGINT)"""


@register(
    "curation_domain_temperature_mix",
    oracle=f"""
    WITH per_source AS (
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    isq AS (
      SELECT *, {isqrt_case_sql('n_tokens')} AS s
      FROM per_source
    ),
    tot AS (
      SELECT SUM(n_tokens) AS big_b, SUM(s) AS big_s FROM isq
    ),
    mixed AS (
      SELECT i.source, i.n_docs, i.n_tokens, i.s,
             CAST(FLOOR(i.n_tokens * 1000000.0 / t.big_b) AS BIGINT)
               AS p_micro,
             CAST(FLOOR(i.s * 1000000.0 / t.big_s) AS BIGINT) AS q_micro,
             CAST((CAST(FLOOR(i.s * 1000000.0 / t.big_s) AS BIGINT)
                   * t.big_b) // i.n_tokens AS BIGINT)
               AS epochs_micro
      FROM isq i CROSS JOIN tot t
    ),
    gated AS (
      SELECT d.source,
             CASE WHEN (d.doc_id * {_HASH_PRIME}) % 1000000
                       < LEAST(m.epochs_micro, 1000000)
                  THEN 1 ELSE 0 END AS kept
      FROM documents d JOIN mixed m ON d.source = m.source
    ),
    kept_counts AS (
      SELECT source, CAST(SUM(kept) AS BIGINT) AS n_kept
      FROM gated GROUP BY source
    )
    SELECT m.source, m.n_docs, m.n_tokens, m.s AS isqrt_tokens,
           m.p_micro, m.q_micro, m.epochs_micro, k.n_kept
    FROM mixed m JOIN kept_counts k ON k.source = m.source
    """,
)
def curation_domain_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain mixing (XLM-R, Conneau et al. 2019,
    arXiv:1911.02116 §3.1): resample sources with q_i proportional to
    p_i^alpha so low-resource domains are upsampled relative to their
    natural share. alpha = 0.5 here — not the paper's 0.3 — because
    p^0.5 = sqrt is the one exponent IEEE-754 specifies as correctly
    rounded, which lets the whole mix table stay CROSS-ENGINE EXACT:
    s_i = isqrt(n_tokens_i) as a BIGINT (the double sqrt is bracket-
    corrected so s*s <= n < (s+1)^2 exactly on both engines), weights
    q_micro = floor(s_i*1e6 / sum_j s_j) in integer micro units, and the
    per-source epoch multiplier epochs_micro = (q_micro * B) div n_i as
    INTEGER floor division (B = total corpus tokens, i.e. a constant-
    token-budget remix). The two-stage floor IS the spec — and with the
    r11 fix the second stage never touches a double, so it is truly
    exact over the whole documented domain: the BIGINT product q_micro*B
    stays under 2^63 for corpora up to ~9e12 tokens (document larger
    runs switch the audit to DECIMAL(38)).

    The realized-sample column replays the `curation_mix_weighted_sample`
    multiplicative-hash gate at rate min(epochs_micro, 1e6)/1e6 — sources
    with epochs_micro > 1e6 are UPsampled (kept whole here; the epoch
    multiplier says how many passes a training run makes over them).

    Scale posture: two scans of documents (one for the per-source rollup,
    one for the gate), a 1-row total broadcast onto a sources-cardinality
    table, and the mix table broadcast back onto the gate scan — no
    fact-side shuffle other than the two per-source integer aggregates.
    The synthetic corpus's sources are near-uniform so the temperature
    barely moves this mix; the arithmetic is exercised (and checked)
    per-source regardless."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    toks = F.size(F.split(F.col("text"), " ")).cast("bigint")
    per_source = (
        fan_out(d)
        .select("doc_id", "source", toks.alias("n_toks"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
        )
    )
    s_raw = F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("bigint")
    s = (
        F.when((s_raw * s_raw) > F.col("n_tokens"), s_raw - 1)
        .when((s_raw + 1) * (s_raw + 1) <= F.col("n_tokens"), s_raw + 1)
        .otherwise(s_raw)
        .cast("bigint")
    )
    isq = per_source.select("source", "n_docs", "n_tokens", s.alias("s"))
    tot = isq.agg(
        F.sum("n_tokens").alias("big_b"), F.sum("s").alias("big_s")
    )
    q_micro = F.floor(F.col("s") * 1000000.0 / F.col("big_s")).cast("bigint")
    # epochs_micro = (q_micro * B) div n — INTEGER floor division, exact over
    # the whole documented ~9e12-token domain (the product stays < 2^63; a
    # double route would lose exactness above 2^53 near floor boundaries).
    mixed = (
        isq.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "s",
            "big_b",
            F.floor(F.col("n_tokens") * 1000000.0 / F.col("big_b"))
            .cast("bigint")
            .alias("p_micro"),
            q_micro.alias("q_micro"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "s",
            "p_micro",
            "q_micro",
            F.expr("(q_micro * big_b) div n_tokens")
            .cast("bigint")
            .alias("epochs_micro"),
        )
    )
    # sources-cardinality table consumed by BOTH the gate scan and the final
    # join — persist so Catalyst doesn't inline the per-source rollup subtree
    # into each consumer (that would re-scan documents a third time); the
    # oracle-selfcheck sweep unpersists cached blocks after each query.
    mixed = mixed.persist()
    gated = (
        d.select("doc_id", "source")
        .join(F.broadcast(mixed.select("source", "epochs_micro")), "source")
        .select(
            "source",
            F.when(
                (F.col("doc_id") * _HASH_PRIME) % 1000000
                < F.least(F.col("epochs_micro"), F.lit(1000000)),
                1,
            )
            .otherwise(0)
            .alias("kept"),
        )
    )
    kept_counts = gated.groupBy("source").agg(
        F.sum("kept").cast("bigint").alias("n_kept")
    )
    return (
        mixed.join(kept_counts, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.col("s").alias("isqrt_tokens"),
            "p_micro",
            "q_micro",
            "epochs_micro",
            "n_kept",
        )
    )
