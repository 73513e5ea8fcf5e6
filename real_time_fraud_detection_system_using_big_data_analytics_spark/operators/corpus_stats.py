"""Corpus-level statistics for training-data curation: distribution
entropy and token-budget sequence packing.

The reference's data profiling is limited to global counts and a fraud
ratio (fraud_detection_model.py:79-81); a 100 TB pretraining pipeline
additionally needs distribution diagnostics (is a source collapsing to one
language?) and the packing step that turns ragged documents into
fixed-budget training sequences. Both are pure built-in-function plans —
no UDFs — and DuckDB-oracle-checkable.

Scale posture:
- entropy aggregates the (source, lang) count table — two cheap shuffles
  over a grouping whose cardinality is sources × languages, microscopic
  next to the corpus; the per-source normalization reuses the same
  shuffle via a window, so the fact table is read once;
- packing's window partitions on lang. Language is a LOW-cardinality key,
  so at 100 TB a single per-lang window would funnel everything through a
  handful of tasks: the production layout range-partitions doc_id within
  lang and packs per partition (bin ids get a partition prefix) — packing
  only needs *a* deterministic order, not one global order, so the
  semantics are unchanged. At test scale the single window is exact and
  matches the oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_tables

_PACK_BUDGET = 512


@register(
    "corpus_entropy_by_source",
    oracle="""
    WITH counts AS (
      SELECT source, lang, COUNT(*) AS n
      FROM documents GROUP BY source, lang
    ), probs AS (
      SELECT source, lang, n,
             CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY source) AS p
      FROM counts
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           COUNT(*) AS n_langs,
           CAST(ROUND(SUM(-p * LN(p)), 4) AS DOUBLE) AS lang_entropy
    FROM probs GROUP BY source
    """,
)
def corpus_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the language mix per source — the curation
    diagnostic for skewed/collapsed sources (entropy 0 = monolingual,
    ln(k) = uniform over k languages). The fact table is aggregated once;
    the per-source total comes from a window over the tiny count table, so
    normalization adds no extra pass."""
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    counts = docs.groupBy("source", "lang").agg(F.count("*").alias("n"))
    p = F.col("n").cast("double") / F.sum("n").over(Window.partitionBy("source"))
    return (
        counts.withColumn("p", p)
        .groupBy("source")
        .agg(
            # BIGINT on both sides — DuckDB widens SUM(BIGINT) to INT128
            F.sum("n").cast("bigint").alias("n_docs"),
            F.count("*").alias("n_langs"),
            F.round(F.sum(-F.col("p") * F.log(F.col("p"))), 4)
            .cast("double")
            .alias("lang_entropy"),
        )
    )


@register(
    "text_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), offsets AS (
      SELECT doc_id, lang, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM toks
    )
    SELECT lang,
           CAST(FLOOR(off / {_PACK_BUDGET}) AS BIGINT) AS bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM offsets GROUP BY lang, bin
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: assign documents to training bins of
    ~512 tokens (_PACK_BUDGET) by cumulative token offset within each language
    stream. This is the offset-chunking packer (deterministic, one window
    pass) rather than first-fit-decreasing — the standard trade at scale,
    where bin assignment must be a pure function of the ordered prefix so
    it can run per-partition without coordination. Token counts use the
    corpus' space-tokenizer convention (see text.py). Returns per-bin
    document and token totals — downstream, the same bin key drives a
    partitioned write so each training shard is one file."""
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    toks = docs.select(
        "doc_id", "lang", F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = toks.withColumn("off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return (
        offsets.groupBy(
            "lang", F.floor(F.col("off") / _PACK_BUDGET).cast("bigint").alias("bin")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
        )
    )


@register(
    "text_unigram_logprob",
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
             COUNT(*) AS n_tokens,
             CAST(SUM(v.lq) AS BIGINT) AS sum_lq
      FROM toks t JOIN vocab v USING (term)
      WHERE t.doc_id % 20 = 0
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_tokens,
           (FLOOR((CAST(sum_lq AS DOUBLE) / (n_tokens * 1000000.0)) * 10000.0 + 0.5) / 10000.0)
             AS avg_neg_logprob
    FROM scored
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score: average negative log-probability of
    each document's tokens under the corpus's own unigram model — the
    cheap stand-in for the KenLM-style LM filter every pretraining
    curation stack runs (high avg-neg-logprob = gibberish / OCR noise;
    near-zero = degenerate repetition).

    Determinism: per-token -ln(p) is quantized to integer MICRO-NATS
    (BIGINT) before summation, so the per-doc aggregate is an exact
    integer sum — immune to float summation order on both engines — and
    only the final per-doc average returns to double (q4).

    Plan: one explode of the corpus feeds BOTH aggregates (vocab counts
    and doc scores); the total-token count is a single-row broadcast
    cross; the vocab table re-joins on term, where AQE picks broadcast
    (vocab ≪ corpus — bounded by the language, not the data). The scored
    side samples doc_id % 20 BEFORE the join, so the expensive join input
    is 1/20th of the corpus.

    At 100 TB: vocab fits executors for any natural-language corpus
    (~10^7 terms × 16B); if it didn't (web-scale n-grams), the join falls
    back to shuffle-on-term where the hot-term skew is exactly the
    MAX_DOC_FREQ cap situation from dedup.py.
    """
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
                -F.log(F.col("cnt").cast("double") / F.col("n_total")) * 1_000_000.0 + 0.5
            )
            .cast("bigint")
            .alias("lq"),
        )
    )
    scored = (
        toks.filter(F.col("doc_id") % 20 == 0)
        .join(vocab, "term")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"), F.sum("lq").alias("sum_lq"))
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        (
            F.floor(
                (F.col("sum_lq").cast("double") / (F.col("n_tokens") * 1_000_000.0))
                * 10_000.0
                + 0.5
            )
            / 10_000.0
        ).alias("avg_neg_logprob"),
    )


@register(
    "corpus_zipf_slope",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents
    ), freqs AS (
      SELECT word, COUNT(*) AS freq FROM words WHERE word <> ''
      GROUP BY word
    ), ranked AS (
      SELECT word, freq,
             ROW_NUMBER() OVER (ORDER BY freq DESC, word) AS rnk
      FROM freqs
    ), pts AS (
      SELECT CAST(FLOOR(LN(rnk) * 1000000.0 + 0.5) AS BIGINT) AS x_micro,
             CAST(FLOOR(LN(freq) * 1000000.0 + 0.5) AS BIGINT) AS y_micro
      FROM ranked WHERE rnk <= 100
    ), sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x_micro) AS BIGINT) AS sx,
             CAST(SUM(y_micro) AS BIGINT) AS sy,
             CAST(SUM(x_micro * y_micro) AS BIGINT) AS sxy,
             CAST(SUM(x_micro * x_micro) AS BIGINT) AS sxx
      FROM pts
    )
    SELECT n, sx, sy,
           CAST(FLOOR((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                      / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                      * 1000000.0 + 0.5) AS BIGINT) AS zipf_slope_micro
    FROM sums
    """,
)
def corpus_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: OLS slope of ln(frequency) on ln(rank) over the top
    100 word types — natural text sits near −1; a corpus drifting toward 0
    (too uniform: boilerplate/spam) or strongly below −1 (degenerate
    repetition) fails the naturalness screen, making this a one-number
    corpus-quality gate alongside corpus_entropy_by_source.

    Determinism: each point's (ln rank, ln freq) is quantized to integer
    micro-units BEFORE the regression sums, so Σx, Σy, Σxy, Σx² are exact
    BIGINTs on both engines (the xy products stay < 2⁶³ by construction:
    |ln| ≤ ~15 → |micro| ≤ 1.5e7 → products ≤ 2.3e14, × 100 points ≤
    2.3e16) and the single closed-form division is quantized at the end —
    the same order-free-regression pattern as graph_assortativity.
    """
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    from pyspark.sql import Window as W

    freqs = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    ranked = freqs.withColumn(
        "rnk", F.row_number().over(W.orderBy(F.desc("freq"), F.asc("word")))
    ).where(F.col("rnk") <= 100)
    pts = ranked.select(
        F.floor(F.log("rnk") * 1_000_000.0 + 0.5).cast("bigint").alias("x_micro"),
        F.floor(F.log("freq") * 1_000_000.0 + 0.5).cast("bigint").alias("y_micro"),
    )
    sums = pts.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x_micro").cast("bigint").alias("sx"),
        F.sum("y_micro").cast("bigint").alias("sy"),
        F.sum(F.col("x_micro") * F.col("y_micro")).cast("bigint").alias("sxy"),
        F.sum(F.col("x_micro") * F.col("x_micro")).cast("bigint").alias("sxx"),
    )
    slope = F.floor(
        (F.col("n").cast("double") * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
        / (F.col("n").cast("double") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * 1_000_000.0
        + 0.5
    ).cast("bigint")
    return sums.select("n", "sx", "sy", slope.alias("zipf_slope_micro"))


@register(
    "corpus_js_divergence_by_source",
    oracle="""
    WITH toks AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS word
      FROM documents
    ), tf AS (
      SELECT source, word, CAST(COUNT(*) AS BIGINT) AS n
      FROM toks WHERE word <> '' GROUP BY source, word
    ), gword AS (
      SELECT word, CAST(SUM(n) AS BIGINT) AS n_g
      FROM tf GROUP BY word HAVING SUM(n) >= 5
    ), vocab AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS v,
             CAST(SUM(n_g) AS BIGINT) AS n_gtot
      FROM gword
    ), stot AS (
      SELECT tf.source, CAST(SUM(tf.n) AS BIGINT) AS n_s
      FROM tf JOIN gword g ON g.word = tf.word GROUP BY tf.source
    ), grid AS (
      SELECT s.source, s.n_s, g.word, g.n_g, COALESCE(t.n, 0) AS n_sw
      FROM gword g CROSS JOIN stot s
      LEFT JOIN tf t ON t.source = s.source AND t.word = g.word
    ), terms AS (
      SELECT source, n_s,
             CAST(FLOOR((
               0.5 * ((n_sw + 1.0) / (n_s + vb.v))
                   * LN(((n_sw + 1.0) / (n_s + vb.v))
                        / (0.5 * (((n_sw + 1.0) / (n_s + vb.v))
                                  + ((n_g + 1.0) / (vb.n_gtot + vb.v)))))
               + 0.5 * ((n_g + 1.0) / (vb.n_gtot + vb.v))
                   * LN(((n_g + 1.0) / (vb.n_gtot + vb.v))
                        / (0.5 * (((n_sw + 1.0) / (n_s + vb.v))
                                  + ((n_g + 1.0) / (vb.n_gtot + vb.v)))))
             ) * 1000000000.0 + 0.5) AS BIGINT) AS c_nano
      FROM grid CROSS JOIN vocab vb
    )
    SELECT source, MAX(n_s) AS n_tokens,
           CAST(SUM(c_nano) AS BIGINT) AS js_nano
    FROM terms GROUP BY source
    """,
)
def corpus_js_divergence_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of each source's unigram distribution
    from the corpus-wide distribution — the domain-shift score a pretrain
    data pipeline uses to spot a source whose language drifted (scraper
    broke, domain changed) and to weight mixture sampling
    (curation_mix_weighted_sample's informed cousin). Laplace-smoothed
    over the >= 5-count shared vocabulary, so every term's p and q are
    strictly positive and BOTH KL halves are finite by construction.

    Determinism: counts are exact BIGINTs; each term contributes one
    nano-quantized double (two LNs over ratios of integer-derived doubles
    with an identical expression tree on both engines — the PSI
    discipline at the same 1e-9 scale), and the per-source total is an
    order-free BIGINT sum. Plan: token counts collapse to (source × word)
    then the V×S grid is vocab ⨯ BROADCAST(20-row source totals) with a
    left join back onto counts — the only large operand is vocabulary
    cardinality, never the token stream."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    toks = d.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).where(F.col("word") != "")
    tf = toks.groupBy("source", "word").agg(F.count("*").cast("bigint").alias("n"))
    gword = (
        tf.groupBy("word")
        .agg(F.sum("n").cast("bigint").alias("n_g"))
        .where(F.col("n_g") >= 5)
    )
    vocab = gword.agg(
        F.count("*").cast("bigint").alias("v"),
        F.sum("n_g").cast("bigint").alias("n_gtot"),
    )
    stot = (
        tf.join(gword.select("word"), "word")
        .groupBy("source")
        .agg(F.sum("n").cast("bigint").alias("n_s"))
    )
    grid = (
        gword.crossJoin(F.broadcast(stot))
        .join(tf, ["source", "word"], "left")
        .select(
            "source",
            "n_s",
            "n_g",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_sw"),
        )
        .crossJoin(F.broadcast(vocab))
    )
    p = (F.col("n_sw") + 1.0) / (F.col("n_s") + F.col("v"))
    qd = (F.col("n_g") + 1.0) / (F.col("n_gtot") + F.col("v"))
    m = 0.5 * (p + qd)
    contrib = 0.5 * p * F.log(p / m) + 0.5 * qd * F.log(qd / m)
    terms = grid.select(
        "source",
        "n_s",
        F.floor(contrib * 1_000_000_000.0 + 0.5).cast("bigint").alias("c_nano"),
    )
    return terms.groupBy("source").agg(
        F.max("n_s").alias("n_tokens"),
        F.sum("c_nano").cast("bigint").alias("js_nano"),
    )


_BUDGET_PCT = 95  # global token budget as a share of the corpus


@register(
    "corpus_token_budget_allocation",
    oracle=f"""
    WITH per_src AS (
      SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS avail
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(FLOOR(SUM(avail) * {_BUDGET_PCT} / 100.0) AS BIGINT) AS budget,
             CAST(COUNT(*) AS BIGINT) AS n_src
      FROM per_src
    ),
    ranked AS (
      SELECT p.source, p.avail, t.budget, t.n_src,
             CAST(ROW_NUMBER() OVER (ORDER BY p.avail, p.source) AS BIGINT) AS rn,
             CAST(COALESCE(SUM(p.avail) OVER (ORDER BY p.avail, p.source
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS prefix
      FROM per_src p CROSS JOIN tot t
    ),
    leveled AS (
      SELECT *, CAST(FLOOR((budget - prefix) * 1.0 / (n_src - rn + 1)) AS BIGINT)
               AS level_k
      FROM ranked
    ),
    cut AS (
      SELECT COALESCE(MIN(CASE WHEN avail > level_k THEN rn END), n_src + 1)
               AS k_star
      FROM leveled GROUP BY n_src
    ),
    lstar AS (
      SELECT c.k_star, COALESCE(MAX(lv.level_k), 0) AS l_star
      FROM cut c LEFT JOIN leveled lv ON lv.rn = c.k_star
      GROUP BY c.k_star
    )
    SELECT l.source, l.avail,
           CAST(CASE WHEN l.rn < c.k_star THEN l.avail ELSE c.l_star END AS BIGINT)
             AS alloc_tokens,
           l.rn >= c.k_star AS capped
    FROM leveled l CROSS JOIN lstar c
    """,
)
def corpus_token_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget WATER-FILLING across sources: given a global budget of
    {_BUDGET_PCT}% of corpus tokens and an equal-share fairness target,
    each source receives min(its availability, the water level L), where
    L is the classic closed form — sort sources by availability ascending,
    take the first rank k* whose availability exceeds the remaining-budget
    fair share L_k = floor((B - prefix_k) / (n - k + 1)); everything below
    k* is fully satisfied, everything at or above is capped at L_{{k*}}.
    This is the mix-planning step a training-data pipeline runs BEFORE
    sampling (curation_mix_weighted_sample executes a given mix; this
    query DERIVES the mix under a budget) — no iteration, pure windows
    over the source-cardinality relation, exact BIGINT throughout.

    Shape: the fact scan collapses to one row per source map-side; the
    water-level search is rank + prefix-sum + one conditional MIN on that
    tiny relation (two 1-row/crossJoin scalars, the house pattern). At
    100 TB the per-source rollup is the only thing that touches data."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    per_src = d.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).cast("bigint").alias("avail")
    )
    tot = per_src.agg(
        F.floor(F.sum("avail") * _BUDGET_PCT / 100.0).cast("bigint").alias("budget"),
        F.count(F.lit(1)).cast("bigint").alias("n_src"),
    )
    w_rank = Window.orderBy("avail", "source")
    w_prefix = w_rank.rowsBetween(Window.unboundedPreceding, -1)
    ranked = (
        per_src.crossJoin(tot)
        .withColumn("rn", F.row_number().over(w_rank).cast("bigint"))
        .withColumn(
            "prefix", F.coalesce(F.sum("avail").over(w_prefix), F.lit(0)).cast("bigint")
        )
    )
    leveled = ranked.withColumn(
        "level_k",
        F.floor(
            (F.col("budget") - F.col("prefix")) / (F.col("n_src") - F.col("rn") + 1)
        ).cast("bigint"),
    )
    cut = leveled.groupBy("n_src").agg(
        F.coalesce(
            F.min(F.when(F.col("avail") > F.col("level_k"), F.col("rn"))),
            F.first("n_src") + 1,
        ).alias("k_star"),
    )
    # the water level is the level AT rank k_star: past the cut the levels
    # DECREASE (each capped source's availability exceeds its fair share),
    # so a MIN over all flagged rows would pick the last — and grossly
    # under-allocate (caught by a budget-sum sanity check, not the oracle,
    # which mirrors whatever formula is written here)
    lstar = (
        cut.join(
            F.broadcast(leveled.select(F.col("rn").alias("k_star"), "level_k")),
            "k_star",
            "left",
        )
        .groupBy("k_star")
        .agg(F.coalesce(F.max("level_k"), F.lit(0)).alias("l_star"))
    )
    return (
        leveled.crossJoin(F.broadcast(lstar))
        .select(
            "source",
            "avail",
            F.when(F.col("rn") < F.col("k_star"), F.col("avail"))
            .otherwise(F.col("l_star"))
            .cast("bigint")
            .alias("alloc_tokens"),
            (F.col("rn") >= F.col("k_star")).alias("capped"),
        )
    )
