"""Text-analysis operators over the `documents` table (north-star surface:
language-ID, quality scoring, token counting, fingerprinting, n-grams).

All token math uses built-in array/string expressions (JVM-side, codegen) —
no Python UDFs: at 100 TB the tokenizer must not cross the JVM/Python
boundary per row. Shared conventions with the oracle SQL:

- tokens = split on single space (the synthetic corpus is space-separated);
- lists are addressed 1-based on both sides (element_at / DuckDB [i]);
- hashes are md5 hex strings (identical bytes in both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import q, q_sql
from ..plans.registry import register
from ..sources.tables import fan_out, load_tables

# Marker stopwords per language for the n-gram/stopword heuristic id.
# Chosen from the corpus vocabulary so scores differ across docs; the
# heuristic is deterministic, which is what the oracle checks.
_MARKERS = {
    "en": ("the", "a", "fast", "slow"),
    "es": ("data", "row", "value"),
    "de": ("stream", "batch", "merge"),
    "fr": ("query", "filter", "join"),
    "zh": ("hash", "scan", "sort"),
}

_STOPWORDS = ("the", "a", "of", "to", "and")


def _tokens() -> Column:
    return F.split(F.col("text"), " ")


@register(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
           (FLOOR((CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS DOUBLE) / len(string_split(text, ' '))) * 10000.0 + 0.5) / 10000.0) AS avg_token_len,
           (FLOOR((CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' '))) * 10000.0 + 0.5) / 10000.0) AS ttr
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, mean token
    length, type-token ratio — all with higher-order array functions."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    toks = _tokens()
    n = F.size(toks)
    ndist = F.size(F.array_distinct(toks))
    total_len = F.aggregate(
        F.transform(toks, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    return d.select(
        "doc_id",
        n.cast("int").alias("n_tokens"),
        ndist.cast("int").alias("n_distinct"),
        q(total_len.cast("double") / n).alias("avg_token_len"),
        q(ndist.cast("double") / n).alias("ttr"),
    )


@register(
    "text_token_count_bpe",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS bpe_ish_tokens,
           CAST(CEIL(length(text) / 4.0) AS INTEGER) AS len4_tokens
    FROM documents
    """,
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three token-count estimators: whitespace, a BPE-ish regex (letter
    runs / digit runs / single other), and the chars/4 heuristic."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return d.select(
        "doc_id",
        F.size(_tokens()).cast("int").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), F.lit(0)))
        .cast("int")
        .alias("bpe_ish_tokens"),
        F.ceil(F.length("text") / 4.0).cast("int").alias("len4_tokens"),
    )


def _marker_count_spark(lang: str) -> Column:
    markers = list(_MARKERS[lang])
    return F.size(F.filter(_tokens(), lambda x: x.isin(*markers)))


def _marker_count_sql(lang: str) -> str:
    inlist = ", ".join(f"'{m}'" for m in _MARKERS[lang])
    return f"len(list_filter(string_split(text, ' '), x -> x IN ({inlist})))"


@register(
    "text_lang_id",
    oracle=f"""
    WITH scores AS (
      SELECT doc_id, lang,
             {_marker_count_sql('en')} AS s_en,
             {_marker_count_sql('es')} AS s_es,
             {_marker_count_sql('de')} AS s_de,
             {_marker_count_sql('fr')} AS s_fr,
             {_marker_count_sql('zh')} AS s_zh
      FROM documents
    )
    SELECT doc_id, lang,
           CASE GREATEST(s_en, s_es, s_de, s_fr, s_zh)
             WHEN s_en THEN 'en' WHEN s_es THEN 'es' WHEN s_de THEN 'de'
             WHEN s_fr THEN 'fr' ELSE 'zh' END AS predicted_lang,
           CAST(GREATEST(s_en, s_es, s_de, s_fr, s_zh) AS INTEGER) AS top_score
    FROM scores
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: count per-language marker tokens, predict the
    argmax (ties broken by the fixed language order en>es>de>fr>zh — the
    CASE evaluates in that order in both engines)."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    scores = {lang: _marker_count_spark(lang) for lang in _MARKERS}
    top = F.greatest(*scores.values())
    pred = (
        F.when(top == scores["en"], "en")
        .when(top == scores["es"], "es")
        .when(top == scores["de"], "de")
        .when(top == scores["fr"], "fr")
        .otherwise("zh")
    )
    return d.select(
        "doc_id",
        "lang",
        pred.alias("predicted_lang"),
        top.cast("int").alias("top_score"),
    )


@register(
    "text_quality_score",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len(string_split(text, ' ')) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS distinct_ratio,
             CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
               / length(text) AS alpha_ratio,
             CAST(len(list_filter(string_split(text, ' '),
                                  x -> x IN {str(_STOPWORDS)})) AS DOUBLE)
               / len(string_split(text, ' ')) AS stopword_ratio
      FROM documents
    )
    SELECT doc_id, CAST(n_chars AS INTEGER) AS n_chars,
           CAST(n_tokens AS INTEGER) AS n_tokens,
           (FLOOR(distinct_ratio * 10000.0 + 0.5) / 10000.0) AS distinct_ratio,
           (FLOOR(alpha_ratio * 10000.0 + 0.5) / 10000.0) AS alpha_ratio,
           (FLOOR(stopword_ratio * 10000.0 + 0.5) / 10000.0) AS stopword_ratio,
           (FLOOR((0.4 * LEAST(n_tokens / 100.0, 1.0)
                 + 0.3 * distinct_ratio
                 + 0.3 * (1.0 - ABS(stopword_ratio - 0.1))) * 10000.0 + 0.5) / 10000.0) AS quality
    FROM feats
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring from length / alpha ratio / stopword ratio /
    type-token ratio — the standard cheap pre-filters of an LLM data
    pipeline, composed into one deterministic score."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    toks = _tokens()
    n_chars = F.length("text")
    n_tokens = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    alpha_ratio = F.length(F.regexp_replace("text", "[^a-z]", "")).cast("double") / n_chars
    stopword_ratio = (
        F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS))).cast("double") / n_tokens
    )
    quality = (
        0.4 * F.least(n_tokens / 100.0, F.lit(1.0))
        + 0.3 * distinct_ratio
        + 0.3 * (1.0 - F.abs(stopword_ratio - 0.1))
    )
    return d.select(
        "doc_id",
        n_chars.cast("int").alias("n_chars"),
        n_tokens.cast("int").alias("n_tokens"),
        q(distinct_ratio).alias("distinct_ratio"),
        q(alpha_ratio).alias("alpha_ratio"),
        q(stopword_ratio).alias("stopword_ratio"),
        q(quality).alias("quality"),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint,
           md5(text) AS exact_hash
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: exact hash (md5 of raw text) and a
    bag-of-words fingerprint (md5 of the sorted distinct token set) that is
    invariant to token order/repetition — the cheap first stage of a dedup
    cascade."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    bow = F.concat_ws(" ", F.array_sort(F.array_distinct(_tokens())))
    return d.select(
        "doc_id",
        F.md5(bow).alias("fingerprint"),
        F.md5(F.col("text")).alias("exact_hash"),
    )


@register(
    "text_top_ngrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    grams AS (
      SELECT unnest(CASE WHEN len(l) >= 3
                         THEN list_transform(generate_series(1, len(l) - 2),
                                             i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])
                         ELSE [] END) AS ngram
      FROM toks
    )
    SELECT ngram, COUNT(*) AS n
    FROM grams
    GROUP BY ngram
    ORDER BY n DESC, ngram
    LIMIT 20
    """,
)
def text_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-20 word trigrams: per-doc n-gram expansion with
    higher-order functions (sequence+transform — no Python), explode,
    count, deterministic top-k (ties broken by the gram itself)."""
    d = fan_out(load_tables(spark, sf_dir, names=("documents",))["documents"])
    toks = _tokens()
    grams = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "ngram")
        .limit(20)
    )


@register(
    "text_tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS cnt FROM toks GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT t.doc_id, t.term,
             (FLOOR(t.cnt * ln(CAST(n.n_docs AS DOUBLE) / df.df) * 10000.0 + 0.5) / 10000.0) AS tfidf,
             ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                ORDER BY t.cnt * ln(CAST(n.n_docs AS DOUBLE) / df.df) DESC,
                                         t.term) AS rn
      FROM tf t JOIN df ON df.term = t.term CROSS JOIN n
      WHERE t.doc_id % 50 = 0
    )
    SELECT doc_id, term, tfidf, rn FROM scored WHERE rn <= 3
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: raw term frequency × ln(N/df), top-3 terms per doc (subset
    doc_id % 50 = 0; term tie-break). Plan: one token explode feeds both
    the tf agg and the df agg; df and the N scalar broadcast back onto tf
    — the fact-side tf rows never shuffle for the joins. ln() on the same
    input double is bit-identical across engines.

    df is derived FROM the tf aggregate ((doc,term) rows are unique, so
    count(*) == count_distinct(doc)) — this removes the count_distinct
    expand (2 shuffles -> 1 cheap re-agg) from the df branch. (AQE does
    not dedupe the shared tf subtree across branches — measured, not
    assumed — so the token expansion still runs per branch; the tf-side
    branch prunes to the doc subset via pushed filter.)"""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    toks = fan_out(d).select("doc_id", F.explode(_tokens()).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("cnt"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    score = F.col("cnt") * F.log(F.col("n_docs").cast("double") / F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(F.col("score_raw").desc(), F.col("term"))
    return (
        tf.filter(F.col("doc_id") % 50 == 0)
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "term", score.alias("score_raw"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "doc_id",
            "term",
            q(F.col("score_raw")).alias("tfidf"),
            F.col("rn").cast("bigint").alias("rn"),
        )
    )


@register(
    "text_normalize",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                               ' +', ' ', 'g')) AS norm_text,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                   ' +', ' ', 'g'))) AS norm_hash
    FROM documents
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization (the first stage of every training-data
    pipeline): lowercase, strip non-alphanumerics, collapse whitespace,
    trim — plus the normalized-content hash that feeds dedup. All
    regexp_replace/lower/trim built-ins, one codegen stage."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    return d.select("doc_id", norm.alias("norm_text"), F.md5(norm).alias("norm_hash"))


@register(
    "text_vocabulary_coverage",
    oracle="""
    WITH counts AS (
      SELECT t.token, COUNT(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
      GROUP BY t.token
    ),
    total AS (SELECT SUM(n) AS total_n FROM counts),
    ranked AS (
      SELECT token, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rnk,
             SUM(n) OVER (ORDER BY n DESC, token
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
      FROM counts
    )
    SELECT rnk, token, CAST(n AS BIGINT) AS n,
           (FLOOR(cum_n * 1.0 / total_n * 10000.0 + 0.5) / 10000.0) AS cum_coverage
    FROM ranked CROSS JOIN total
    WHERE rnk <= 25
    """,
)
def text_vocabulary_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary analysis: top-25 tokens with cumulative corpus coverage
    (the 'how big must the vocab be' curve). Token counts aggregate
    map-side; the running-sum window runs over the tiny ranked head, not
    the corpus. Ties broken by token for cross-engine determinism."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    # persist: the vocab-count table (|vocab| rows, tiny) feeds BOTH the
    # grand total and the ranking — uncached, each consumer would replay
    # the corpus-wide token explode + aggregate
    counts = (
        fan_out(d)
        .select(F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .persist()
    )
    total = counts.agg(F.sum("n").alias("total_n"))
    w_rank = Window.orderBy(F.col("n").desc(), "token")
    ranked = counts.select(
        "token", "n", F.row_number().over(w_rank).cast("bigint").alias("rnk")
    ).filter(F.col("rnk") <= 25)
    w_cum = Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, 0)
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            "rnk",
            "token",
            F.col("n").cast("bigint").alias("n"),
            q(F.sum("n").over(w_cum) / F.col("total_n")).alias("cum_coverage"),
        )
    )


@register(
    "corpus_filter_funnel",
    oracle="""
    SELECT COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
           CAST(SUM(CASE WHEN lang = 'en' AND n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_len,
           CAST(SUM(CASE WHEN lang = 'en' AND n_chars >= 200
                          AND len(list_distinct(string_split(text, ' '))) * 1.0
                              / len(string_split(text, ' ')) >= 0.4
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_len_quality
    FROM documents
    """,
)
def corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-funnel accounting: survivors after each pipeline stage
    (language -> length -> diversity) computed as ONE conditional
    aggregate over one scan — the pattern for auditing what each cleaning
    stage costs without running N count jobs."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    toks = _tokens()
    ttr = F.size(F.array_distinct(toks)) * 1.0 / F.size(toks)
    lang = F.col("lang") == "en"
    length = F.col("n_chars") >= 200
    quality = ttr >= 0.4
    return d.agg(
        F.count("*").alias("n_total"),
        F.sum(lang.cast("long")).alias("n_lang"),
        F.sum((lang & length).cast("long")).alias("n_lang_len"),
        F.sum((lang & length & quality).cast("long")).alias("n_lang_len_quality"),
    )


@register(
    "text_chunk_windows",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, len(toks) - 1, 24)) AS start_tok
      FROM t
    )
    SELECT doc_id,
           CAST(start_tok / 24 AS BIGINT) AS chunk_idx,
           CAST(start_tok AS BIGINT) AS start_tok,
           CAST(len(list_slice(toks, start_tok + 1, start_tok + 32)) AS BIGINT)
             AS chunk_tokens,
           md5(array_to_string(list_slice(toks, start_tok + 1, start_tok + 32), ' '))
             AS chunk_hash
    FROM s
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (window 32 tokens, stride 24 — 8-token
    overlap): the flatMap that turns a raw corpus into fixed-size training
    contexts. Pure generate-and-explode (sequence + posexplode + slice), so
    the fan-out is JVM-side codegen with no Python boundary and no shuffle —
    chunks inherit the document partitioning, which is exactly what the
    downstream tokenize/pack stage wants at 100 TB. Trailing partial windows
    are kept (slice clamps at the end on both engines); chunk identity is the
    md5 of the re-joined window so the oracle compares content, not offsets
    alone."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    toks = fan_out(d).select("doc_id", _tokens().alias("toks"))
    starts = F.sequence(F.lit(0), F.size("toks") - 1, F.lit(24))
    chunk = F.slice(F.col("toks"), F.col("start_tok") + 1, 32)
    return (
        toks.select("doc_id", "toks", F.posexplode(starts).alias("chunk_idx", "start_tok"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.col("start_tok").cast("bigint").alias("start_tok"),
            F.size(chunk).cast("bigint").alias("chunk_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
        )
    )


@register(
    "text_bigram_lm",
    oracle="""
    WITH toks AS (
      SELECT string_split(text, ' ') AS l FROM documents
    ),
    bi AS (
      SELECT unnest(CASE WHEN len(l) >= 2
                         THEN list_transform(generate_series(1, len(l) - 1),
                                             i -> [l[i], l[i+1]])
                         ELSE [] END) AS b
      FROM toks
    ),
    counts AS (
      SELECT b[1] AS w1, b[2] AS w2, COUNT(*) AS n FROM bi GROUP BY 1, 2
    ),
    tot AS (
      SELECT w1, w2, n, SUM(n) OVER (PARTITION BY w1) AS n_w1 FROM counts
    )
    SELECT w1, w2, n, CAST(n_w1 AS BIGINT) AS n_w1,
           CAST(FLOOR(1000000.0 * n / n_w1 + 0.5) AS BIGINT) AS p_micro
    FROM tot ORDER BY n DESC, w1, w2 LIMIT 20
    """,
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional bigram language model over the corpus: top-20 bigrams
    with P(w2|w1) = c(w1,w2)/c(w1,·) reported in integer MICRO-units
    (floor(1e6·p + .5) — the same integer-probability trick
    text_unigram_logprob uses, so the cross-engine check is exact, no
    float division surface). Bigram expansion is the in-row
    sequence+transform idiom (zero Python); the conditional denominator
    is a window sum over the already-aggregated bigram counts — it runs
    on |vocab²-observed| rows, not tokens. With unigram_logprob this
    completes the n-gram LM quality-scoring pair: unigram for fluency
    priors, conditional bigram for local coherence.

    At 100 TB the bigram count table is the shuffled object (capped by
    observed vocabulary pairs); the raw token stream never shuffles —
    expansion and pre-aggregation are map-side."""
    d = fan_out(load_tables(spark, sf_dir, names=("documents",))["documents"])
    toks = _tokens()
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    counts = (
        d.select(F.explode(pairs).alias("b"))
        .groupBy(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("w1")
    return (
        counts.withColumn("n_w1", F.sum("n").over(w).cast("long"))
        .withColumn(
            "p_micro",
            F.floor(1000000.0 * F.col("n") / F.col("n_w1") + 0.5).cast("long"),
        )
        .orderBy(F.col("n").desc(), "w1", "w2")
        .limit(20)
    )


@register(
    "text_bpe_merge_step",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    wc AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM words WHERE length(word) >= 2 GROUP BY word
    ),
    pairs AS (
      SELECT unnest(list_transform(generate_series(1, length(word) - 1),
                                   i -> substr(word, i, 2))) AS pair,
             cnt
      FROM wc
    )
    SELECT pair, CAST(SUM(cnt) AS BIGINT) AS merge_count
    FROM pairs GROUP BY pair
    ORDER BY merge_count DESC, pair
    LIMIT 20
    """,
)
def text_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-training merge step: corpus-weighted adjacent-symbol pair
    counts (characters as the initial symbol alphabet), top-20 candidates
    by count with a lexicographic tiebreak — the argmax row is the pair a
    BPE trainer would merge next.

    Plan shape is the tokenizer-training trick that makes BPE feasible at
    corpus scale: the pair expansion runs over the DISTINCT-WORD relation
    (vocabulary-sized, ≪ corpus) carrying each word's frequency, never
    over the raw token stream. Two shuffles total — word counts, then
    pair counts — and the top-20 compiles to TakeOrderedAndProject.
    Single-char words are excluded on both sides (they contribute no
    pairs; and Spark's sequence(1, 0) would generate a DESCENDING range
    rather than an empty one — an engine-semantics trap the length guard
    sidesteps)."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    wc = (
        fan_out(d)
        .select(F.explode(_tokens()).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    pairs = wc.select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
        "cnt",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").cast("long").alias("merge_count"))
        .orderBy(F.col("merge_count").desc(), "pair")
        .limit(20)
    )


@register(
    "text_langid_confusion",
    oracle=f"""
    WITH scores AS (
      SELECT doc_id, lang,
             {_marker_count_sql('en')} AS s_en,
             {_marker_count_sql('es')} AS s_es,
             {_marker_count_sql('de')} AS s_de,
             {_marker_count_sql('fr')} AS s_fr,
             {_marker_count_sql('zh')} AS s_zh
      FROM documents
    ),
    pred AS (
      SELECT lang AS gold_lang,
             CASE GREATEST(s_en, s_es, s_de, s_fr, s_zh)
               WHEN s_en THEN 'en' WHEN s_es THEN 'es' WHEN s_de THEN 'de'
               WHEN s_fr THEN 'fr' ELSE 'zh' END AS predicted_lang
      FROM scores
    )
    SELECT gold_lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY gold_lang, predicted_lang
    """,
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic-classifier evaluation over corpus metadata: the lang-id
    prediction (same argmax + tie order as text_lang_id) cross-tabulated
    against the gold `lang` column — the confusion matrix a curation run
    publishes before trusting a cheap classifier to route documents. One
    map-side scoring pass + one partial agg on the tiny (gold, pred) key
    domain; no shuffle carries document text."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    scores = {lang: _marker_count_spark(lang) for lang in _MARKERS}
    top = F.greatest(*scores.values())
    pred = (
        F.when(top == scores["en"], "en")
        .when(top == scores["es"], "es")
        .when(top == scores["de"], "de")
        .when(top == scores["fr"], "fr")
        .otherwise("zh")
    )
    return (
        d.select(F.col("lang").alias("gold_lang"), pred.alias("predicted_lang"))
        .groupBy("gold_lang", "predicted_lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction
# ---------------------------------------------------------------------------

_RAKE_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on")
_RAKE_STOP_SQL = ", ".join(f"'{w}'" for w in _RAKE_STOPWORDS)


@register(
    "text_rake_keywords",
    oracle=f"""
    WITH toks0 AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ), toks AS (
      SELECT doc_id, unnest(generate_series(1, len(ws))) AS pos, ws
      FROM toks0
    ), flagged AS (
      SELECT doc_id, pos, ws[pos] AS word,
             CASE WHEN ws[pos] IN ({_RAKE_STOP_SQL}) THEN 1 ELSE 0 END AS is_stop
      FROM toks WHERE ws[pos] <> ''
    ), runs AS (
      SELECT doc_id, pos, word, is_stop,
             SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS UNBOUNDED PRECEDING) AS run_id
      FROM flagged
    ), phrase_words AS (
      SELECT doc_id, run_id, pos, word FROM runs WHERE is_stop = 0
    ), phrases AS (
      SELECT doc_id, run_id,
             STRING_AGG(word, ' ' ORDER BY pos) AS phrase,
             COUNT(*) AS plen
      FROM phrase_words GROUP BY doc_id, run_id
    ), word_stats AS (
      SELECT pw.word,
             COUNT(*) AS freq,
             CAST(SUM(p.plen) AS BIGINT) AS deg
      FROM phrase_words pw
      JOIN phrases p ON p.doc_id = pw.doc_id AND p.run_id = pw.run_id
      GROUP BY pw.word
    ), phrase_scored AS (
      SELECT p.doc_id, p.run_id, p.phrase, p.plen,
             CAST(SUM(CAST(FLOOR(ws.deg * 1000000.0 / ws.freq + 0.5) AS BIGINT))
                  AS BIGINT) AS score_micro
      FROM phrases p
      JOIN phrase_words pw ON pw.doc_id = p.doc_id AND pw.run_id = p.run_id
      JOIN word_stats ws ON ws.word = pw.word
      WHERE p.plen BETWEEN 2 AND 6
      GROUP BY p.doc_id, p.run_id, p.phrase, p.plen
    )
    SELECT phrase,
           COUNT(*) AS n_occurrences,
           MAX(score_micro) AS score_micro
    FROM phrase_scored
    GROUP BY phrase
    ORDER BY score_micro DESC, phrase
    LIMIT 15
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    maximal stopword-free token runs; each word scores degree/frequency
    (degree = summed length of every phrase it appears in), and a phrase
    scores the sum of its words' scores. Top-15 phrases corpus-wide.

    Determinism: per-word scores are quantized to integer micro-units
    BEFORE the per-phrase sum, so the aggregate is an order-free BIGINT
    sum on both engines (the float-sum-order hazard this repo's oracle
    conventions exist to kill). Identical phrase strings score identically
    by construction, so the cross-document GROUP BY phrase is stable.

    Plan shape: one posexplode pass builds positioned tokens; the
    stopword-run island id is a prefix sum per doc (one doc_id shuffle);
    phrases and word stats aggregate from the same exploded set, and the
    scoring join is token-cardinality ⋈ word-cardinality (AQE broadcasts
    the word-stats side). Nothing is quadratic in document length.
    """
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    toks = fan_out(d).select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "word"),
    ).where(F.col("word") != "")
    flagged = toks.withColumn(
        "is_stop", F.col("word").isin(*_RAKE_STOPWORDS).cast("int")
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runs = flagged.withColumn("run_id", F.sum("is_stop").over(w_run))
    # persisted: phrase_words feeds THREE consumers (phrases, word_stats,
    # phrase_scored) and phrases two — uncached, each re-runs the explode
    # + prefix-sum window chain (guide §5).
    phrase_words = runs.where(F.col("is_stop") == 0).select(
        "doc_id", "run_id", "pos", "word"
    ).persist()
    phrases = phrase_words.groupBy("doc_id", "run_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(pos, word))),"
            " s -> s.word), ' ')"
        ).alias("phrase"),
        F.count("*").alias("plen"),
    ).persist()
    word_stats = (
        phrase_words.join(phrases, ["doc_id", "run_id"])
        .groupBy("word")
        .agg(
            F.count("*").alias("freq"),
            F.sum("plen").cast("bigint").alias("deg"),
        )
    )
    phrase_scored = (
        phrases.where(F.col("plen").between(2, 6))
        .join(phrase_words, ["doc_id", "run_id"])
        .join(word_stats, "word")
        .groupBy("doc_id", "run_id", "phrase", "plen")
        .agg(
            F.sum(
                F.floor(F.col("deg") * 1_000_000.0 / F.col("freq") + 0.5).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("score_micro")
        )
    )
    return (
        phrase_scored.groupBy("phrase")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.max("score_micro").alias("score_micro"),
        )
        .orderBy(F.desc("score_micro"), "phrase")
        .limit(15)
    )


@register(
    "text_collocation_pmi",
    oracle="""
    WITH toks0 AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ), toks AS (
      SELECT doc_id, unnest(generate_series(1, len(ws))) AS pos, ws
      FROM toks0
    ), words AS (
      SELECT doc_id, pos, ws[pos] AS word
      FROM toks WHERE ws[pos] <> ''
    ), bigrams AS (
      SELECT a.word AS w1, b.word AS w2, COUNT(*) AS n_pair
      FROM words a JOIN words b
        ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      GROUP BY 1, 2
    ), uni AS (
      SELECT word, COUNT(*) AS n_word FROM words GROUP BY word
    ), totals AS (
      SELECT (SELECT CAST(SUM(n_pair) AS BIGINT) FROM bigrams) AS n_bi,
             (SELECT CAST(SUM(n_word) AS BIGINT) FROM uni) AS n_uni
    )
    SELECT b.w1, b.w2, b.n_pair,
           CAST(FLOOR(LN((CAST(b.n_pair AS DOUBLE) * t.n_uni * t.n_uni)
                         / (CAST(t.n_bi AS DOUBLE) * u1.n_word * u2.n_word))
                      * 1000000.0 + 0.5) AS BIGINT) AS pmi_micro
    FROM bigrams b
    JOIN uni u1 ON u1.word = b.w1
    JOIN uni u2 ON u2.word = b.w2
    CROSS JOIN totals t
    WHERE b.n_pair >= 5
    ORDER BY pmi_micro DESC, b.w1, b.w2
    LIMIT 20
    """,
)
def text_collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocations: adjacent word pairs
    whose co-occurrence beats the independence expectation —
    PMI = ln(p(xy)/(p(x)p(y))) with min support 5, top-20. The standard
    phrase-mining signal on top of raw bigram counts (text_top_ngrams
    counts; this ranks by surprise).

    The PMI argument is assembled from exact BIGINT counts on both
    engines, so LN sees the bit-identical double; the result is quantized
    to micro-units. Adjacency comes from a positioned-token self-join on
    (doc_id, pos+1) — co-partitioned on doc_id, one shuffle; unigram and
    bigram tables are vocabulary-cardinality and broadcast into the
    scoring join.
    """
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    words = (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "word"),
        )
        .where(F.col("word") != "")
    )
    a = words.select("doc_id", "pos", F.col("word").alias("w1"))
    b = words.select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("word").alias("w2")
    )
    bigrams = (
        a.join(b, ["doc_id", "pos"])
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n_pair"))
        .where(F.col("n_pair") >= 5)
    )
    uni = words.groupBy("word").agg(F.count("*").alias("n_word")).persist()
    n_uni = uni.agg(F.sum("n_word").cast("bigint").alias("n_uni"))
    # total bigram count = all adjacent pairs (pre-support-filter), matching
    # the oracle's SUM over the unfiltered bigram table: tokens - docs
    n_bi = (
        words.groupBy("doc_id")
        .agg((F.count("*") - 1).alias("m"))
        .agg(F.sum("m").cast("bigint").alias("n_bi"))
    )
    u1 = uni.select(F.col("word").alias("w1"), F.col("n_word").alias("n_w1"))
    u2 = uni.select(F.col("word").alias("w2"), F.col("n_word").alias("n_w2"))
    pmi = F.floor(
        F.log(
            (F.col("n_pair").cast("double") * F.col("n_uni") * F.col("n_uni"))
            / (F.col("n_bi").cast("double") * F.col("n_w1") * F.col("n_w2"))
        )
        * 1_000_000.0
        + 0.5
    ).cast("bigint")
    return (
        bigrams.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n_bi))
        .crossJoin(F.broadcast(n_uni))
        .select("w1", "w2", "n_pair", pmi.alias("pmi_micro"))
        .orderBy(F.desc("pmi_micro"), "w1", "w2")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TextRank keyword ranking
# ---------------------------------------------------------------------------

def _textrank_oracle() -> str:
    """Unrolled 3-iteration weighted-PageRank chain over the word
    co-occurrence graph; scores carried as integer micros each round."""
    head = f"""
    WITH toks0 AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ), toks AS (
      SELECT doc_id, unnest(generate_series(1, len(ws))) AS pos, ws
      FROM toks0
    ), words AS (
      SELECT doc_id, pos, ws[pos] AS word FROM toks
      WHERE ws[pos] <> '' AND ws[pos] NOT IN ({_RAKE_STOP_SQL})
    ), seq AS (
      SELECT doc_id, word,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS rpos
      FROM words
    ), nbr AS (
      SELECT doc_id, word,
             LEAD(word, 1) OVER win AS w1,
             LEAD(word, 2) OVER win AS w2
      FROM seq WINDOW win AS (PARTITION BY doc_id ORDER BY rpos)
    ), pairs AS (
      SELECT LEAST(word, w1) AS a, GREATEST(word, w1) AS b
      FROM nbr WHERE w1 IS NOT NULL AND word <> w1
      UNION ALL
      SELECT LEAST(word, w2) AS a, GREATEST(word, w2) AS b
      FROM nbr WHERE w2 IS NOT NULL AND word <> w2
    ), edges0 AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS w FROM pairs GROUP BY a, b
    ), und AS (
      SELECT a AS src, b AS dst, w FROM edges0
      UNION ALL
      SELECT b AS src, a AS dst, w FROM edges0
    ), wdeg AS (
      SELECT src, CAST(SUM(w) AS BIGINT) AS wd FROM und GROUP BY src
    ), s0 AS (
      SELECT src AS node, CAST(1000000 AS BIGINT) AS s FROM wdeg
    )"""
    prev = "s0"
    steps = []
    for i in (1, 2, 3):
        steps.append(f"""
    , s{i} AS (
      SELECT u.dst AS node,
             CAST(150000 + FLOOR(0.85 * SUM(
               CAST(FLOOR(CAST(u.w * s.s AS DOUBLE) / d.wd + 0.5) AS BIGINT)
             ) + 0.5) AS BIGINT) AS s
      FROM und u
      JOIN {prev} s ON s.node = u.src
      JOIN wdeg d ON d.src = u.src
      GROUP BY u.dst
    )""")
        prev = f"s{i}"
    return head + "".join(steps) + f"""
    SELECT s.node AS word, d.wd AS wdeg, s.s AS score_micro
    FROM {prev} s JOIN wdeg d ON d.src = s.node
    ORDER BY score_micro DESC, word
    LIMIT 20
    """


@register("text_textrank_keywords", oracle=_textrank_oracle())
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword ranking (Mihalcea & Tarau 2004): weighted PageRank
    over the word co-occurrence graph — tokens (stopword-filtered, as
    RAKE) co-occur when within distance 2 in the filtered sequence; edge
    weight = corpus-wide co-occurrence count; 3 synchronous damped
    iterations (d=0.85) from uniform init; top-20 words. Complements RAKE:
    degree/frequency scoring vs global random-walk centrality.

    Determinism (the iterative-fixpoint discipline shared with
    cluster_kmeans_embeddings and graph_label_propagation): scores live as
    integer MICROS between rounds; each edge contribution floor-quantizes
    w·s/wdeg before an order-free BIGINT sum, and the single 0.85·sum
    product is one double op on an exactly-representable integer. Both
    engines therefore carry bit-identical state into every round.

    Plan: co-occurrence needs NO self-join — two LEADs over one
    (doc_id, rpos) window build the distance-≤2 pairs, then one aggregate
    makes the edge list. Each round joins the persisted edge list to the
    vocabulary-sized score table (broadcast — vocab ≪ corpus; same
    fallback note as label propagation: at web-vocab scale co-partition
    edges and scores on src instead) and re-aggregates by dst. The edge
    list never re-shuffles across rounds."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "word"),
    ).where((F.col("word") != "") & ~F.col("word").isin(*_RAKE_STOPWORDS))
    seq = toks.withColumn(
        "rpos",
        F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
    )
    win = Window.partitionBy("doc_id").orderBy("rpos")
    nbr = seq.select(
        "word",
        F.lead("word", 1).over(win).alias("w1"),
        F.lead("word", 2).over(win).alias("w2"),
    )
    pairs = (
        nbr.where(F.col("w1").isNotNull() & (F.col("word") != F.col("w1")))
        .select(
            F.least("word", "w1").alias("a"), F.greatest("word", "w1").alias("b")
        )
        .unionAll(
            nbr.where(F.col("w2").isNotNull() & (F.col("word") != F.col("w2")))
            .select(
                F.least("word", "w2").alias("a"),
                F.greatest("word", "w2").alias("b"),
            )
        )
    )
    # persist the two multiply-consumed aggregates: edges0 feeds both und
    # branches (else the whole tokenize→window→co-occur pipeline runs once
    # per branch) and wdeg feeds trans + the score init + the final join
    # (else that pipeline runs twice MORE). Guide §5: cache hot subtrees
    # that are genuinely reused within one query.
    edges0 = pairs.groupBy("a", "b").agg(
        F.count("*").cast("bigint").alias("w")
    ).persist()
    und = edges0.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "w"
    ).unionAll(edges0.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w"))
    wdeg = und.groupBy("src").agg(F.sum("w").cast("bigint").alias("wd")).persist()
    trans = und.join(wdeg, "src").persist()
    scores = wdeg.select(
        F.col("src").alias("node"), F.lit(1_000_000).cast("bigint").alias("s")
    )
    for _ in range(3):
        contrib = F.floor(
            (F.col("w") * F.col("s")).cast("double") / F.col("wd") + 0.5
        ).cast("bigint")
        scores = (
            trans.join(F.broadcast(scores), trans["src"] == scores["node"])
            .groupBy("dst")
            .agg(
                (
                    F.lit(150_000)
                    + F.floor(0.85 * F.sum(contrib) + 0.5)
                )
                .cast("bigint")
                .alias("s")
            )
            .withColumnRenamed("dst", "node")
        )
    return (
        scores.join(wdeg, scores["node"] == wdeg["src"])
        .select(
            F.col("node").alias("word"),
            F.col("wd").alias("wdeg"),
            F.col("s").alias("score_micro"),
        )
        .orderBy(F.desc("score_micro"), "word")
        .limit(20)
    )


_HASHTF_BUCKETS = 16
_HEX = "0123456789abcdef"


def _hashing_tf_oracle() -> str:
    cols = ", ".join(
        f"CAST(SUM(CASE WHEN bucket = {b} THEN 1 ELSE 0 END) AS BIGINT) AS b{b}"
        for b in range(_HASHTF_BUCKETS)
    )
    return f"""
    WITH toks0 AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ), toks AS (
      SELECT doc_id, unnest(ws) AS word FROM toks0
    ), bucketed AS (
      SELECT doc_id,
             (strpos('{_HEX}', substring(md5(word), 1, 1)) - 1)
               % {_HASHTF_BUCKETS} AS bucket
      FROM toks WHERE word <> ''
    )
    SELECT doc_id, {cols}
    FROM bucketed GROUP BY doc_id
    """


@register("text_hashing_trick_tf", oracle=_hashing_tf_oracle())
def text_hashing_trick_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the 'hashing trick', Weinberger et al. 2009):
    fixed-width term-frequency vectors with NO vocabulary — each token
    maps to bucket md5(token)[0] mod 16 and the doc's feature vector is
    the bucket-count row. The property that matters at 100 TB: the
    featurizer is STATELESS (no vocabulary broadcast, no fit pass, no
    OOV), so it composes with streaming and with any partitioning — the
    engine-side equivalent of MLlib's HashingTF, here with a
    cross-engine-checkable hash (md5's first nibble, not murmur3, so
    DuckDB reproduces every bucket exactly).

    Plan: explode → one map-side-combinable aggregate keyed on doc_id
    with 16 conditional sums — one shuffle at document cardinality, no
    pivot (bucket count is a compile-time constant)."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).where(F.col("word") != "")
    bucket = (
        F.instr(F.lit(_HEX), F.substring(F.md5("word"), 1, 1)) - 1
    ) % _HASHTF_BUCKETS
    return (
        toks.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(F.when(F.col("bucket") == b, 1).otherwise(0))
                .cast("bigint")
                .alias(f"b{b}")
                for b in range(_HASHTF_BUCKETS)
            ]
        )
    )


@register(
    "text_ngram_novelty",
    oracle="""
    WITH toks0 AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ), toks AS (
      SELECT doc_id, unnest(generate_series(1, len(ws))) AS pos, ws
      FROM toks0
    ), words AS (
      SELECT doc_id, pos, ws[pos] AS word FROM toks WHERE ws[pos] <> ''
    ), tri AS (
      SELECT doc_id,
             word || ' ' || LEAD(word, 1) OVER win || ' '
                  || LEAD(word, 2) OVER win AS trigram
      FROM words WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
    ), tri2 AS (
      SELECT DISTINCT doc_id, trigram FROM tri WHERE trigram IS NOT NULL
    ), first_seen AS (
      SELECT trigram, MIN(doc_id) AS first_doc FROM tri2 GROUP BY trigram
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           CAST(SUM(CASE WHEN f.first_doc = t.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(FLOOR(SUM(CASE WHEN f.first_doc = t.doc_id THEN 1 ELSE 0 END)
                      * 1000000.0 / COUNT(*) + 0.5) AS BIGINT)
             AS novelty_micro
    FROM tri2 t JOIN first_seen f ON f.trigram = t.trigram
    GROUP BY t.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document trigram novelty against the ingestion order: the share
    of a doc's distinct trigrams whose FIRST corpus occurrence is that
    doc — the streaming-dedup quality signal pretrain pipelines track
    (novelty collapsing toward 0 means the crawl is re-reading itself;
    the per-doc complement of dedup_repeated_passages' corpus view).

    Trigrams come from two LEADs over the (doc, pos) window (joinless, as
    TextRank); first-occurrence is one MIN aggregate over distinct
    (doc, trigram) pairs; novelty is an integer-quantized ratio. Two
    shuffles total (trigram, then doc), both map-side combinable. The
    'earlier' relation is doc_id order — at scale that is the ingestion
    sequence number a crawler already assigns."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "word"),
    ).where(F.col("word") != "")
    win = Window.partitionBy("doc_id").orderBy("pos")
    tri = toks.select(
        "doc_id",
        F.concat_ws(
            " ",
            "word",
            F.lead("word", 1).over(win),
            F.lead("word", 2).over(win),
        ).alias("trigram"),
        F.lead("word", 2).over(win).alias("w2chk"),
    ).where(F.col("w2chk").isNotNull()).select("doc_id", "trigram").distinct()
    first_seen = tri.groupBy("trigram").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        tri.join(first_seen, "trigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_trigrams"),
            novel.cast("bigint").alias("n_novel"),
            F.floor(novel * 1_000_000.0 / F.count("*") + 0.5)
            .cast("bigint")
            .alias("novelty_micro"),
        )
    )


@register(
    "text_tfidf_cosine_pairs",
    oracle="""
    WITH toks AS (
      SELECT DISTINCT doc_id, word, n FROM (
        SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
              FROM documents)
        WHERE word <> '' GROUP BY doc_id, word
      )
    ), df AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM toks GROUP BY word
      HAVING COUNT(*) BETWEEN 2 AND 20
    ), n_total AS (
      SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM toks
    ), weighted AS (
      SELECT t.doc_id, t.word,
             t.n * CAST(FLOOR(LN(CAST(nt.n AS DOUBLE) / d.n_docs) * 1000.0
                              + 0.5) AS BIGINT) AS w
      FROM toks t JOIN df d ON d.word = t.word CROSS JOIN n_total nt
    ), norms AS (
      SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS norm2
      FROM weighted GROUP BY doc_id
    ), nums AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(SUM(a.w * b.w) AS BIGINT) AS num
      FROM weighted a JOIN weighted b
        ON a.word = b.word AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT n.doc_a, n.doc_b,
           CAST(FLOOR(CAST(n.num AS DOUBLE) * 1000000.0
                      / (SQRT(CAST(na.norm2 AS DOUBLE))
                         * SQRT(CAST(nb.norm2 AS DOUBLE))) + 0.5) AS BIGINT)
             AS cosine_micro
    FROM nums n
    JOIN norms na ON na.doc_id = n.doc_a
    JOIN norms nb ON nb.doc_id = n.doc_b
    ORDER BY cosine_micro DESC, n.doc_a, n.doc_b
    LIMIT 15
    """,
)
def text_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARSE-vector document similarity: TF-IDF cosine over the shared-
    term join — the lexical near-dup/same-topic detector that complements
    MinHash (set overlap) and embedding cosine (dense semantics): IDF
    weighting makes two docs similar for sharing RARE words, not
    stopwords. Top-15 pairs.

    The pair enumeration joins doc-term weights on the term — and the
    df BETWEEN 2 AND 20 band is simultaneously the relevance filter
    (df=1 terms pair nothing; common terms carry no signal) and the skew
    guard bounding the join to Σ df² per term (dedup's MAX_DOC_FREQ
    discipline). Exactness: idf quantizes to integer milli-units ONCE,
    so weights, norms² and dot products are all exact BIGINT sums inside
    double's 2^53 (bounded by the df cap); the only float ops are two
    IEEE-correctly-rounded SQRTs and one division in a fixed tree."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    toks = (
        d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    df = (
        toks.groupBy("word")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .where(F.col("n_docs").between(2, 20))
    )
    n_total = toks.agg(
        F.count_distinct("doc_id").cast("bigint").alias("corpus_n")
    )
    idf_milli = F.floor(
        F.log(F.col("corpus_n").cast("double") / F.col("n_docs")) * 1000.0 + 0.5
    ).cast("bigint")
    weighted = (
        toks.join(df, "word")
        .crossJoin(F.broadcast(n_total))
        .select("doc_id", "word", (F.col("n") * idf_milli).alias("w"))
    )
    norms = weighted.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).cast("bigint").alias("norm2")
    )
    a, b = weighted.alias("a"), weighted.alias("b")
    nums = (
        a.join(
            b,
            (F.col("a.word") == F.col("b.word"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.sum(F.col("a.w") * F.col("b.w")).cast("bigint").alias("num"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("norm2").alias("norm2_a"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("norm2").alias("norm2_b"))
    cos = F.floor(
        F.col("num").cast("double")
        * 1_000_000.0
        / (
            F.sqrt(F.col("norm2_a").cast("double"))
            * F.sqrt(F.col("norm2_b").cast("double"))
        )
        + 0.5
    ).cast("bigint")
    return (
        nums.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", cos.alias("cosine_micro"))
        .orderBy(F.desc("cosine_micro"), "doc_a", "doc_b")
        .limit(15)
    )


_GOPHER_STOP_SQL = "['the', 'a', 'of', 'to', 'and']"


@register(
    "text_gopher_quality_rules",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    rowfeats AS (
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_tokens,
             CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT)
               AS sum_word_len,
             CAST(len(list_intersect(list_distinct(ws),
                                     {_GOPHER_STOP_SQL})) AS BIGINT)
               AS n_stop_distinct
      FROM base
    ),
    tokc AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(ws) AS tok FROM base)
      GROUP BY doc_id, tok
    ),
    tokagg AS (
      SELECT doc_id, CAST(MAX(c) AS BIGINT) AS max_token_freq
      FROM tokc GROUP BY doc_id
    ),
    bgc AS (
      SELECT doc_id, bg, COUNT(*) AS c
      FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(ws) - 1),
                                     i -> ws[i] || ' ' || ws[i + 1])) AS bg
        FROM base WHERE len(ws) >= 2
      )
      GROUP BY doc_id, bg
    ),
    bgagg AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
               AS dup_bigram_tokens
      FROM bgc GROUP BY doc_id
    ),
    feats AS (
      SELECT r.doc_id, r.n_tokens, r.sum_word_len, r.n_stop_distinct,
             t.max_token_freq,
             CAST(r.n_tokens - 1 AS BIGINT) AS n_bigrams,
             COALESCE(b.dup_bigram_tokens, 0) AS dup_bigram_tokens
      FROM rowfeats r
      JOIN tokagg t ON t.doc_id = r.doc_id
      LEFT JOIN bgagg b ON b.doc_id = r.doc_id
    )
    SELECT doc_id, n_tokens, sum_word_len, n_stop_distinct, max_token_freq,
           n_bigrams, dup_bigram_tokens,
           CAST(n_tokens >= 50 AND n_tokens <= 100000 AS INTEGER) AS r_word_count,
           CAST(sum_word_len >= 3 * n_tokens
                AND sum_word_len <= 10 * n_tokens AS INTEGER) AS r_mean_word_len,
           CAST(n_stop_distinct >= 2 AS INTEGER) AS r_stopwords,
           CAST(max_token_freq * 10 <= n_tokens AS INTEGER) AS r_top_token,
           CAST(dup_bigram_tokens * 10 <= n_bigrams AS INTEGER) AS r_dup_bigram,
           CAST(n_tokens >= 50 AND n_tokens <= 100000
                AND sum_word_len >= 3 * n_tokens AND sum_word_len <= 10 * n_tokens
                AND n_stop_distinct >= 2
                AND max_token_freq * 10 <= n_tokens
                AND dup_bigram_tokens * 10 <= n_bigrams AS INTEGER) AS gopher_pass
    FROM feats
    """,
)
def text_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-rule cascade (Rae et al. 2021,
    arXiv:2112.11446 §A1.1): the five repetition/shape rules that
    survive translation to this whitespace corpus — word count in
    [50, 100k], mean word length in [3, 10], >= 2 distinct stopwords,
    top-token fraction <= 10%, duplicate-bigram token fraction <= 10%
    (standing in for the paper's duplicate line/paragraph rules — this
    corpus has no line structure). Every rule is an INTEGER
    cross-multiplication (no ratio ever computed in floating point), so
    pass/fail bits cannot drift between engines.

    Plan shape — a MEASURED lesson (SCALING.md r9): the first version
    computed the repetition counters as per-row nested higher-order
    folds (`filter(ngrams, x == g)` per distinct g) to stay
    shuffle-free, and the slope harness clocked it at ~36 ms/doc — the
    lambda re-evaluates the n-gram array per element, so the 'map-only'
    plan hid an O(n²)-with-string-constants per-row term (180 s at the
    x1 twin; linear slope, catastrophic constant). This version keeps
    only the genuinely O(n) features per-row (length sums, stopword
    intersect) and routes both repetition counters through explode →
    two map-side-combinable aggregates keyed on (doc, gram) — the
    curation_repetition_ratio shape — then one doc-cardinality join.
    ~90x faster at x1, and at 100 TB the shuffles carry only integer
    counters keyed by doc: the right trade, measured rather than
    asserted."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    ws = F.split(F.col("text"), " ")
    base = fan_out(d).select("doc_id", ws.alias("ws"))
    n_tokens = F.size("ws").cast("bigint")
    rowfeats = base.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.aggregate(
            F.transform("ws", lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
        )
        .cast("bigint")
        .alias("sum_word_len"),
        F.size(
            F.array_intersect(
                F.array_distinct("ws"), F.array(*[F.lit(s) for s in _STOPWORDS])
            )
        )
        .cast("bigint")
        .alias("n_stop_distinct"),
    )
    tokagg = (
        base.select("doc_id", F.explode("ws").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("bigint").alias("max_token_freq"))
    )
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("ws") - 1),
        lambda i: F.concat_ws(" ", F.element_at("ws", i), F.element_at("ws", i + 1)),
    )
    bgagg = (
        base.filter(F.size("ws") >= 2)
        .select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("dup_bigram_tokens")
        )
    )
    feats = (
        rowfeats.join(tokagg, "doc_id")
        .join(bgagg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "sum_word_len",
            "n_stop_distinct",
            "max_token_freq",
            (F.col("n_tokens") - 1).cast("bigint").alias("n_bigrams"),
            F.coalesce("dup_bigram_tokens", F.lit(0)).cast("bigint").alias(
                "dup_bigram_tokens"
            ),
        )
    )
    r_wc = (F.col("n_tokens") >= 50) & (F.col("n_tokens") <= 100000)
    r_mwl = (F.col("sum_word_len") >= 3 * F.col("n_tokens")) & (
        F.col("sum_word_len") <= 10 * F.col("n_tokens")
    )
    r_stop = F.col("n_stop_distinct") >= 2
    r_top = F.col("max_token_freq") * 10 <= F.col("n_tokens")
    r_dup = F.col("dup_bigram_tokens") * 10 <= F.col("n_bigrams")
    return feats.select(
        "doc_id",
        "n_tokens",
        "sum_word_len",
        "n_stop_distinct",
        "max_token_freq",
        "n_bigrams",
        "dup_bigram_tokens",
        r_wc.cast("int").alias("r_word_count"),
        r_mwl.cast("int").alias("r_mean_word_len"),
        r_stop.cast("int").alias("r_stopwords"),
        r_top.cast("int").alias("r_top_token"),
        r_dup.cast("int").alias("r_dup_bigram"),
        (r_wc & r_mwl & r_stop & r_top & r_dup).cast("int").alias("gopher_pass"),
    )


# --- Gopher repetition signals (the full §A1.1 n-gram suite) -----------------

# thresholds from Rae et al. 2021 (arXiv:2112.11446, Table A1), in percent:
# fraction of characters in the most frequent {2,3,4}-gram, and fraction of
# characters covered by duplicated {5,10}-grams (the two ends of the 5..10
# band the paper sweeps).
_REP_TOP_PCT = {2: 20, 3: 18, 4: 16}
_REP_DUP_PCT = {5: 15, 10: 10}


def _rep_oracle() -> str:
    """DuckDB oracle for text_gopher_repetition_signals, built per-n from
    one template so the Spark plan and the SQL can only drift together."""
    tops = []
    for n, pct in _REP_TOP_PCT.items():
        tops.append(f"""
    top{n} AS (
      -- grouped and tie-broken on the 16-hex md5 prefix, with the gram's
      -- char count carried as an integer: identical on both engines, and
      -- the exchange carries 24 bytes per gram instead of the string
      SELECT doc_id, CAST(c * glen AS BIGINT) AS chars
      FROM (
        SELECT doc_id, gh, glen, COUNT(*) AS c,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY COUNT(*) DESC, gh) AS rn
        FROM (
          SELECT doc_id, substr(md5(g), 1, 16) AS gh,
                 length(g) - {n - 1} AS glen
          FROM (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(ws) - {n - 1}),
                          i -> array_to_string(ws[i:i + {n - 1}], ' '))) AS g
            FROM base WHERE len(ws) >= {n}
          )
        ) GROUP BY doc_id, gh, glen
      ) WHERE rn = 1
    )""")
    dups = []
    for n in _REP_DUP_PCT:
        dups.append(f"""
    dup{n} AS (
      SELECT t.doc_id, CAST(SUM(length(t.tok)) AS BIGINT) AS chars
      FROM (
        SELECT DISTINCT doc_id, unnest(generate_series(i, i + {n - 1})) AS p
        FROM (
          -- group by a 16-hex md5 prefix of the gram, not the string:
          -- md5 is byte-identical on both engines, so a collision (~2^-64)
          -- would alter BOTH sides identically — cross-engine exactness is
          -- unconditional, and the shuffle carries 16 bytes, not the gram
          SELECT doc_id, i, gh,
                 COUNT(*) OVER (PARTITION BY doc_id, gh) AS c
          FROM (
            SELECT doc_id, i,
                   substr(md5(array_to_string(ws[i:i + {n - 1}], ' ')), 1, 16) AS gh
            FROM base, unnest(generate_series(1, len(ws) - {n - 1})) u(i)
            WHERE len(ws) >= {n}
          )
        ) WHERE c >= 2
      ) cov
      JOIN (
        SELECT doc_id, p.i AS p, ws[p.i] AS tok FROM base,
               unnest(generate_series(1, len(ws))) p(i)
      ) t ON t.doc_id = cov.doc_id AND t.p = cov.p
      GROUP BY t.doc_id
    )""")
    flags = []
    sel = []
    for n, pct in _REP_TOP_PCT.items():
        sel.append(f"COALESCE(t{n}.chars, 0) AS top{n}_chars")
        flags.append(f"COALESCE(t{n}.chars, 0) * 100 <= b.total_chars * {pct}")
    for n, pct in _REP_DUP_PCT.items():
        sel.append(f"COALESCE(d{n}.chars, 0) AS dup{n}_chars")
        flags.append(f"COALESCE(d{n}.chars, 0) * 100 <= b.total_chars * {pct}")
    flag_cols = ",\n           ".join(
        f"CAST({f} AS INTEGER) AS r_{name}"
        for f, name in zip(
            flags,
            [f"top{n}" for n in _REP_TOP_PCT] + [f"dup{n}" for n in _REP_DUP_PCT],
        )
    )
    return f"""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    base AS (
      SELECT doc_id, ws,
             CAST(length(array_to_string(ws, ' ')) - (len(ws) - 1) AS BIGINT)
               AS total_chars
      FROM docs
    ),{",".join(tops)},{",".join(dups)}
    SELECT b.doc_id, b.total_chars,
           {", ".join(sel)},
           {flag_cols},
           CAST({" AND ".join(flags)} AS INTEGER) AS rep_pass
    FROM base b
    LEFT JOIN top2 t2 ON t2.doc_id = b.doc_id
    LEFT JOIN top3 t3 ON t3.doc_id = b.doc_id
    LEFT JOIN top4 t4 ON t4.doc_id = b.doc_id
    LEFT JOIN dup5 d5 ON d5.doc_id = b.doc_id
    LEFT JOIN dup10 d10 ON d10.doc_id = b.doc_id
    """


@register("text_gopher_repetition_signals", oracle=_rep_oracle())
def text_gopher_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL Gopher repetition suite (Rae et al. 2021, arXiv:2112.11446
    §A1.1 / Table A1) — the n-gram half that text_gopher_quality_rules'
    five shape rules left uncovered: per document, the fraction of
    characters in the most frequent {2,3,4}-gram (frequency × gram chars)
    and the fraction of characters COVERED by duplicated {5,10}-grams
    (union of window positions — overlapping duplicate windows count each
    character once, the paper's no-double-counting reading), with
    pass/fail flags at the paper's thresholds (20/18/16% and 15/10%) as
    pure integer cross-multiplications — no ratio ever crosses the engine
    boundary. Character base = total token chars (whitespace excluded),
    computed as length(text) − (n_tokens − 1) on both engines.

    Scale posture: every aggregation is doc-local, so ONE doc_id-keyed
    exchange family covers the whole plan (gram counts partition by
    (doc_id, gram) — within-doc counts, cardinality bounded by corpus
    tokens); the dup coverage dedups (doc_id, position) pairs, at most
    one row per corpus token; nothing global, no broadcast, no float.
    Determinism: count-tied top grams break on the 16-hex md5-prefix key
    (the same key that carries grams through the exchange) — arbitrary
    with respect to gram VALUES but deterministic and engine-identical,
    which is all the oracle comparison needs; with count-tied grams of
    unequal length, top{n}_chars is therefore hash-order-determined (r12
    ADVICE: this docstring used to claim a lexicographic tie-break). All
    outputs BIGINT."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    docs = fan_out(d).select("doc_id", F.split("text", " ").alias("ws"))

    # r14 (guide §4.2, second step after r13's union fusion): EVERY signal
    # here is doc-local INTEGER logic — n-gram counts, a count/hash-prefix
    # argmax, a position-coverage union, token-length sums — so the whole
    # computation runs per document inside ONE map-only Arrow kernel and
    # the plan drops from a 5-way window explode + 33 Exchanges to a scan,
    # the kernel, and a projection. Exactness is structural, not float:
    # the kernel reproduces the JVM expressions' key and order semantics
    # exactly — hashlib.md5 over the UTF-8 gram == F.md5 (both hash the
    # string's UTF-8 bytes), Python len(str) == F.length (both count code
    # points), gram groups keyed by (16-hex-md5-prefix, glen) with ties
    # broken by (count desc, gh asc) — hex-ASCII string order, identical
    # in both — and the dup coverage dedups (gh-group, position) exactly
    # as the count-over window did. All outputs are BIGINTs; no double is
    # ever produced, so there is no accumulation-order question at all.
    # (The r13 union form spent ~5.4 s of its 9.8 s cold sf1 wall just
    # BUILDING the window strings through interpreted lambdas; the
    # per-doc Python loop is faster AND removes the exchanges.)
    import hashlib
    from typing import Iterator

    import pyarrow as pa
    import pyspark.sql.types as T

    top_ns = tuple(_REP_TOP_PCT)
    dup_ns = tuple(_REP_DUP_PCT)
    out_names = (
        ["doc_id", "total_chars"]
        + [f"top{n}_chars" for n in top_ns]
        + [f"dup{n}_chars" for n in dup_ns]
    )
    out_schema = T.StructType(
        [T.StructField(c, T.LongType(), False) for c in out_names]
    )

    def _doc_stats(toks: list) -> list:
        lens = [len(t) for t in toks]
        total = sum(lens)
        m = len(toks)
        row = [total]
        md5 = hashlib.md5
        for n in top_ns:
            if m < n:
                row.append(0)
                continue
            counts: dict = {}
            for i in range(m - n + 1):
                g = " ".join(toks[i : i + n])
                key = (md5(g.encode("utf-8")).hexdigest()[:16], len(g) - (n - 1))
                counts[key] = counts.get(key, 0) + 1
            (gh, glen), c = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0][0])
            )
            row.append(c * glen)
        for n in dup_ns:
            if m < n:
                row.append(0)
                continue
            pos: dict = {}
            for i in range(m - n + 1):
                g = " ".join(toks[i : i + n])
                pos.setdefault(md5(g.encode("utf-8")).hexdigest()[:16], []).append(i)
            covered: set = set()
            for ps in pos.values():
                if len(ps) >= 2:
                    for i in ps:
                        covered.update(range(i, i + n))
            row.append(sum(lens[p] for p in covered))
        return row

    def kernel(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            if batch.num_rows == 0:
                continue
            ids = batch.column(0).to_pylist()
            wss = batch.column(1).to_pylist()
            rows = [[i] + _doc_stats(ws) for i, ws in zip(ids, wss)]
            cols = [
                pa.array([r[k] for r in rows], pa.int64())
                for k in range(len(out_names))
            ]
            yield pa.RecordBatch.from_arrays(cols, names=out_names)

    out = docs.mapInArrow(kernel, out_schema)
    cols = [F.col("doc_id"), F.col("total_chars")]
    flags = []
    for n, pct in list(_REP_TOP_PCT.items()) + list(_REP_DUP_PCT.items()):
        kind = "top" if n in _REP_TOP_PCT else "dup"
        ch = F.col(f"{kind}{n}_chars").cast("bigint")
        cols.append(ch.alias(f"{kind}{n}_chars"))
        flags.append((ch * 100 <= F.col("total_chars") * pct))
    for flag, (n, _) in zip(flags, list(_REP_TOP_PCT.items()) + list(_REP_DUP_PCT.items())):
        kind = "top" if n in _REP_TOP_PCT else "dup"
        cols.append(flag.cast("int").alias(f"r_{kind}{n}"))
    all_pass = flags[0]
    for f_ in flags[1:]:
        all_pass = all_pass & f_
    cols.append(all_pass.cast("int").alias("rep_pass"))
    return out.select(*cols)
