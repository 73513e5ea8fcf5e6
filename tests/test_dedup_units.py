"""Dedup semantics on synthetic corpora with KNOWN duplicates (the driver
corpus has none, so cluster behavior is pinned here)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_fraud_detection_system_using_big_data_analytics_spark.operators.dedup import (
    _shingles_spark,
    dedup_exact,
)


@pytest.fixture()
def corpus(spark, tmp_path):
    """5 docs: 0==1 exact dup; 2 is a near-dup of 0 (one word changed);
    3, 4 unrelated."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy cat again and again today"
    docs = [
        (0, base, "en", "src", len(base)),
        (1, base, "en", "src", len(base)),
        (2, near, "en", "src", len(near)),
        (3, "completely different words here nothing shared with others", "en", "src", 58),
        (4, "spark engine window join filter group sort hash scan merge", "en", "src", 58),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string, source string, n_chars long")
    out = str(tmp_path / "documents.parquet")
    df.write.parquet(out)
    # mirror the other tables the loader may touch
    return str(tmp_path)


def test_exact_dedup_clusters(spark, corpus, tmp_path):
    clusters = dedup_exact(spark, corpus).collect()
    by_size = sorted((r["cluster_size"], r["keeper_doc_id"]) for r in clusters)
    assert by_size == [(1, 2), (1, 3), (1, 4), (2, 0)]


def test_shingle_expansion(spark, corpus):
    d = spark.read.parquet(f"{corpus}/documents.parquet")
    sh = _shingles_spark(d)
    doc3 = [r["shingle"] for r in sh.filter(F.col("doc_id") == 3).collect()]
    # 8 tokens -> 6 trigrams, all distinct
    assert len(doc3) == 6
    assert doc3[0] == "completely different words"


def test_minhash_lsh_finds_near_dup_pair(spark, corpus):
    """The near-dup pair (0,2) differs by 3 of 11 shingles -> jaccard ≈
    0.57; with 4 bands × 2 rows the pair must surface as a candidate, and
    exact dups (0,1) must agree on all 8 minhashes."""
    from real_time_fraud_detection_system_using_big_data_analytics_spark.operators.dedup import (
        dedup_minhash_lsh_pairs,
    )

    pairs = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in dedup_minhash_lsh_pairs(spark, corpus).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs or (1, 2) in pairs, f"near-dup pair not surfaced: {pairs}"
    assert all(a < b for (a, b) in pairs)


def test_simhash_identical_for_exact_dups(spark, corpus):
    from real_time_fraud_detection_system_using_big_data_analytics_spark.operators.dedup import (
        dedup_simhash,
    )

    sigs = {r["doc_id"]: r["simhash"] for r in dedup_simhash(spark, corpus).collect()}
    assert sigs[0] == sigs[1]
    assert len(sigs[0]) == 16 and set(sigs[0]) <= {"0", "1"}
    # near-dup differs in few bits; unrelated docs differ in more
    ham = lambda a, b: sum(x != y for x, y in zip(a, b))
    assert ham(sigs[0], sigs[2]) <= ham(sigs[0], sigs[3]) + 2


def test_jaccard_exact_value(spark, corpus):
    from real_time_fraud_detection_system_using_big_data_analytics_spark.operators.dedup import (
        dedup_ngram_jaccard,
    )

    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_ngram_jaccard(spark, corpus).collect()
    }
    assert pairs[(0, 1)] == 1.0
    # doc0 vs doc2: 13 tokens -> 11 trigrams each; one word change breaks 3
    # shingles -> |inter| = 8, |union| = 14 -> 0.5714
    assert abs(pairs[(0, 2)] - 8 / 14) < 1e-4


def test_salted_join_equals_plain_join(spark):
    """salted_join must produce exactly the plain join's rows on a skewed
    fixture (90% of left rows share one hot key)."""
    from pyspark.sql import functions as F

    from real_time_fraud_detection_system_using_big_data_analytics_spark.operators.skew import (
        salted_join,
    )

    left = spark.range(0, 1000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 5).alias("k"),
    )
    right = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(10)], "k long, label string"
    )
    plain = {(r["row_id"], r["label"]) for r in left.join(right, "k").collect()}
    salted = {
        (r["row_id"], r["label"])
        for r in salted_join(left, right, key="k", salt_from="row_id", n_salts=8).collect()
    }
    assert salted == plain and len(plain) == 1000


def test_semdedup_planted_twins_all_pruned_originals_survive(spark):
    """The planted near-dup twins (vec_id >= 1,000,000) MUST be pruned —
    their original (lower id, same cell by positive-scale sign
    invariance, cosine ~0.9999) is always an earlier witness — and no
    original may be pruned by a twin (twins have higher ids; originals
    have no natural pairs above the threshold)."""
    from real_time_fraud_detection_system_using_big_data_analytics_spark.plans import registry

    registry.load_all()  # order-independence: this file alone must suffice
    rows = registry.QUERIES["dedup_semdedup"](spark, "/root/testdata/sf0.001").collect()
    twins = [r for r in rows if r.vec_id >= 1_000_000]
    originals = [r for r in rows if r.vec_id < 1_000_000]
    assert twins, "no planted twins in corpus"
    assert all(r.is_pruned for r in twins)
    assert all(not r.is_pruned for r in originals)
    # survivor set == original corpus: dedup removed exactly the dups
    assert len([r for r in rows if not r.is_pruned]) == len(originals)


def test_substring_runs_exact_spans(spark, tmp_path):
    """Pin dedup_substring_runs' gaps-and-islands semantics on a corpus
    with KNOWN copied passages: an 18-token copy -> one run of exactly 18
    duplicated tokens in both docs; two disjoint 12-token copies -> two
    runs; an 11-token copy (< SUBSTR_MIN=12) -> filtered out entirely."""
    from real_time_fraud_detection_system_using_big_data_analytics_spark.plans import registry

    a = [f"a{i}" for i in range(30)]
    b = [f"b{i}" for i in range(10)]
    c = [f"c{i}" for i in range(5)]
    d = [f"d{i}" for i in range(10)]
    e = [f"e{i}" for i in range(5)]
    f_ = [f"f{i}" for i in range(5)]
    g = [f"g{i}" for i in range(20)]
    doc0 = a                                       # source of all a-copies
    doc1 = b + a[5:23] + c                         # 18-token copy a5..a22
    doc2 = a[5:17] + d + a[18:30]                  # two 12-token copies
    doc3 = g                                       # source of the short copy
    doc4 = e + g[1:12] + f_                        # 11-token copy: below MIN
    rows = [
        (i, " ".join(t), "en", "src", len(" ".join(t)))
        for i, t in enumerate([doc0, doc1, doc2, doc3, doc4])
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (r["n_runs"], r["max_run_tokens"], r["dup_tokens"])
        for r in registry.QUERIES["dedup_substring_runs"](spark, str(tmp_path)).collect()
    }
    # doc0's shared windows: a-index runs [5,15] (11 windows, span 18, from
    # doc1's copy fused with doc2's first block) and [18,22] (5 windows,
    # span 12, doc2's second block)
    assert got == {
        0: (2, 18, 30),
        1: (1, 18, 18),
        2: (2, 12, 24),
        # docs 3 and 4 share only an 11-token substring: span 11 < 12 -> absent
    }


def test_levenshtein_blocked_equals_quadratic(spark):
    """The FastSS deletion-neighborhood blocking is EXACT for edit
    distance <= 1 (two strings at Levenshtein distance <= 1 must share a
    1-deletion-neighborhood member), so the corpus-scaled twin must return
    the identical pair set as the diagnostic nation-blocked quadratic —
    recall proven by value, not asserted."""
    from real_time_fraud_detection_system_using_big_data_analytics_spark.plans import registry

    registry.load_all()
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        blocked = sorted(
            map(tuple, registry.QUERIES["dedup_levenshtein_blocked"](spark, sf).collect())
        )
        quad = sorted(
            map(tuple, registry.QUERIES["dedup_levenshtein_pairs"](spark, sf).collect())
        )
        assert blocked == quad and len(blocked) > 0


def test_gopher_repetition_signals_exact(spark, tmp_path):
    """Pin the repetition-signal semantics on manufactured docs: a known
    most-frequent n-gram (count-tied grams break on the md5-prefix hash key
    — deterministic and engine-identical, NOT lexicographic; r12 ADVICE),
    a known duplicate-5gram POSITION UNION (overlapping windows count each
    char once), and a clean doc that passes every threshold."""
    from real_time_fraud_detection_system_using_big_data_analytics_spark.plans import registry

    registry.load_all()
    # doc 0: 16 single-char tokens. top-2gram: 3-way count tie ('a b',
    # 'c d', 'd e', count 3 each) broken by md5-prefix hash order — but all
    # three span 2 token-chars, so top2_chars = 3*2 is tie-invariant
    # -> 6 chars of 16. dup-5grams: windows at 7/10
    # ('c d e c d') and 8/11 ('d e c d e') -> covered positions 7..15 = 9
    # chars. No duplicate 10-gram.
    doc0 = "a b a b a b c d e c d e c d e x"
    # doc 1: 40 distinct tokens, zero repetition -> all rules pass.
    doc1 = " ".join(f"w{i}" for i in range(40))
    rows = [(i, t, "en", "src", len(t)) for i, t in enumerate([doc0, doc1])]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: r.asDict()
        for r in registry.QUERIES["text_gopher_repetition_signals"](
            spark, str(tmp_path)
        ).collect()
    }
    d0 = got[0]
    assert d0["total_chars"] == 16
    assert d0["top2_chars"] == 6 and d0["r_top2"] == 0
    assert d0["top3_chars"] == 9 and d0["r_top3"] == 0  # 'c d e' x3
    assert d0["top4_chars"] == 8 and d0["r_top4"] == 0  # 'a b a b' x2, lex min
    assert d0["dup5_chars"] == 9 and d0["r_dup5"] == 0  # union 7..15
    assert d0["dup10_chars"] == 0 and d0["r_dup10"] == 1
    assert d0["rep_pass"] == 0
    d1 = got[1]
    assert d1["dup5_chars"] == 0 and d1["rep_pass"] == 1
