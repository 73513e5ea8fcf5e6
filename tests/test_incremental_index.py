"""Incremental-maintenance contracts (r13): the persisted-index ADD paths
must be byte-faithful to a from-scratch rebuild, and the incremental shard
dedup must find known cross-boundary duplicates without touching
corpus-internal pairs.

The oracle gate already value-checks both registered queries end to end;
these tests pin the two properties the oracle comparison cannot see:
read-back equality of the APPENDED index files with a full rebuild, and
cluster semantics on a literal fixture with planted duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_ivf_incremental_add_equals_full_rebuild(spark):
    """The appended index (base build + frozen-centroid add) must hold
    EXACTLY the rows a from-scratch assignment of the full corpus to the
    same base-fitted centroids produces — same vectors, same cells, same
    norms. Any refit-on-add, dropped batch, or double-append shows here."""
    from real_time_fraud_detection_system_using_big_data_analytics_spark.operators.clustering import (
        _ivf_corpus,
        fitted_centroids_base,
        ivf_incremental_index_path,
    )

    path = ivf_incremental_index_path(spark, SF)
    cents = fitted_centroids_base(spark, SF)
    got = sorted(
        (r["vec_id"], r["cell"], r["e_norm"])
        for r in spark.read.parquet(path)
        .select("vec_id", F.col("cell").cast("bigint").alias("cell"), "e_norm")
        .collect()
    )
    want = sorted(
        (r["vec_id"], r["cell"], r["e_norm"])
        for r in _ivf_corpus(spark, SF, cents)
        .select("vec_id", "cell", "e_norm")
        .collect()
    )
    assert got == want
    # and the add genuinely contributed: the newest decile is present
    bound = max(v for v, _, _ in got) + 1
    n_new = sum(1 for v, _, _ in got if v * 10 >= 9 * bound)
    assert n_new > 0


def test_ivf_incremental_probe_scan_is_partition_pruned(spark):
    """Same plan contract as ann_ivf_persisted_probe: the incremental
    index scan must prune to the probed cells at plan time and join the
    broadcast query side — appending must not cost the scan its
    pruning."""
    from real_time_fraud_detection_system_using_big_data_analytics_spark.plans import (
        registry,
    )
    from real_time_fraud_detection_system_using_big_data_analytics_spark.plans.explain import (
        plan_string,
    )

    registry.load_all()
    df = registry.QUERIES["ann_ivf_incremental_add"](spark, SF)
    plan = plan_string(df)
    assert "PartitionFilters" in plan, plan
    assert "cell" in plan.split("PartitionFilters")[1][:300], plan
    assert "CartesianProduct" not in plan, plan


@pytest.fixture()
def shard_corpus(spark, tmp_path):
    """10 docs; ids 0..8 are the corpus (bound = 10, 9 deciles = 9), id 9
    is the shard. The shard doc is an exact copy of corpus doc 2; corpus
    docs 0 and 1 are ALSO exact dups of each other — a corpus-internal
    pair the incremental op must NOT emit."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    uniq = [
        f"unrelated filler document number {i} with its own words entirely %s {i}"
        for i in range(6)
    ]
    docs = (
        [(0, base + " alpha"), (1, base + " alpha"), (2, base + " beta")]
        + [(3 + i, uniq[i]) for i in range(6)]
        + [(9, base + " beta")]
    )
    rows = [(i, t, "en", "src", len(t)) for i, t in docs]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_incremental_shard_dedup_semantics(spark, shard_corpus):
    """The shard doc (9, an exact copy of corpus doc 2, and a near-dup of
    corpus docs 0/1 — one word differs) must surface as a (2, 9) pair
    with est_jaccard 1.0; the corpus-internal dup pair (0, 1) must NOT
    appear (doc_a is always corpus, doc_b always shard); the assignment
    query must send doc 9 to the LOWEST-id qualifying corpus match (the
    keeper convention) with the matching candidate count."""
    from real_time_fraud_detection_system_using_big_data_analytics_spark.operators.dedup import (
        dedup_incremental_new_shard,
        dedup_incremental_shard_assign,
    )

    pairs = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in dedup_incremental_new_shard(spark, shard_corpus).collect()
    }
    assert pairs.get((2, 9)) == 1.0, pairs
    assert all(b == 9 for (_, b) in pairs), pairs  # shard side only
    assert (0, 1) not in pairs and (1, 0) not in pairs

    assign = {
        r["doc_id"]: (r["assigned_cluster"], r["n_dup_candidates"])
        for r in dedup_incremental_shard_assign(spark, shard_corpus).collect()
    }
    assert set(assign) == {9}
    cluster, n = assign[9]
    qualifying = {a for (a, _), est in pairs.items() if est >= 0.5}
    assert 2 in qualifying  # the planted exact dup qualifies
    assert cluster == min(qualifying)
    assert n == len(qualifying)

def test_lsh_index_merge_is_append_only_and_rebuild_equal(spark, tmp_path):
    """dedup_incremental_index_merge's two on-disk contracts, observed
    between the build steps: (1) appending the shard's band rows leaves
    every pre-existing index file byte-identical (O(batch) maintenance —
    no corpus rewrite), adding new files; (2) the merged table read back
    digests EQUAL to a from-scratch full-corpus index built in one pass
    (the Spark-side complement of the DuckDB oracle, which recomputes the
    digest from raw text)."""
    import glob
    import hashlib
    import os

    from real_time_fraud_detection_system_using_big_data_analytics_spark.operators.dedup import (
        _band_rows,
        _index_digest_spark,
        _signatures_spark,
        append_shard_index,
        write_corpus_index,
    )
    from real_time_fraud_detection_system_using_big_data_analytics_spark.sources.tables import (
        load_tables,
    )

    tbl = "lsh_merge_test_tbl"
    path = str(tmp_path / tbl)
    try:
        write_corpus_index(spark, SF, tbl, path)

        def snapshot():
            out = {}
            for f in glob.glob(os.path.join(path, "**", "*"), recursive=True):
                if os.path.isfile(f) and not f.endswith("_SUCCESS"):
                    out[f] = hashlib.md5(open(f, "rb").read()).hexdigest()
            return out

        before = snapshot()
        assert before, "corpus build wrote no files?"
        append_shard_index(spark, SF, tbl)
        after = snapshot()
        for f, digest in before.items():
            assert f in after and after[f] == digest, f"rewrote {f}"
        assert len(after) > len(before), "append added no files"

        docs = load_tables(spark, SF, names=("documents",))["documents"]
        full = _index_digest_spark(_band_rows(_signatures_spark(docs)))
        merged = _index_digest_spark(spark.table(tbl))
        assert merged.exceptAll(full).count() == 0
        assert full.exceptAll(merged).count() == 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_merged_index_probe_stays_colocated(spark):
    """Appending must not cost the index its bucketed-join property: a
    probe joined against the MERGED table (multiple files per bucket)
    still reads a bucketed scan with no Exchange on the index side."""
    from real_time_fraud_detection_system_using_big_data_analytics_spark.operators.dedup import (
        _band_rows,
        _signatures_spark,
        lsh_merged_index,
    )
    from real_time_fraud_detection_system_using_big_data_analytics_spark.plans.explain import (
        plan_string,
    )
    from real_time_fraud_detection_system_using_big_data_analytics_spark.sources.tables import (
        load_tables,
    )

    tbl = lsh_merged_index(spark, SF)
    d = load_tables(spark, SF, names=("documents",))["documents"]
    probe = _band_rows(_signatures_spark(d.limit(20))).select(
        F.col("doc_id").alias("doc_b"), "bucket_key"
    )
    idx = spark.table(tbl).select(F.col("doc_id").alias("doc_a"), "bucket_key")
    joined = idx.hint("merge").join(probe, "bucket_key")
    plan = plan_string(joined, mode="simple")
    assert "Bucketed: true" in plan, plan
    assert plan.count("Exchange hashpartitioning(bucket_key") == 1, plan


def test_ivf_delete_compact_two_phase_contracts(spark, tmp_path):
    """The erasure pair's on-disk contracts, observed between phases on a
    private index copy: (1) tombstoning leaves every index file
    untouched and the tombstone-aware read path (anti-join) already
    serves the post-delete answer; (2) compaction rewrites EXACTLY the
    affected cell directories (unaffected files byte-identical, every
    pre-compaction file of an affected cell gone), removes the sidecar,
    and the read-back equals the anti-join view row-for-row — i.e. the
    original index minus the delete slice, nothing else."""
    import glob
    import hashlib
    import os
    import re
    import shutil

    from real_time_fraud_detection_system_using_big_data_analytics_spark.operators.clustering import (
        _DELETE_MOD,
        _DELETE_RES,
        ivf_apply_tombstones,
        ivf_compact_deletes,
        ivf_incremental_index_path,
    )

    src = ivf_incremental_index_path(spark, SF)
    path = str(tmp_path / "ivf_idx")
    shutil.copytree(src, path)

    def rows():
        return sorted(
            (r["vec_id"], r["cell"], r["e_norm"])
            for r in spark.read.parquet(path)
            .select("vec_id", F.col("cell").cast("bigint").alias("cell"), "e_norm")
            .collect()
        )

    def snapshot():
        out = {}
        for f in glob.glob(os.path.join(path, "**", "*"), recursive=True):
            if os.path.isfile(f) and not f.endswith("_SUCCESS"):
                out[f] = hashlib.md5(open(f, "rb").read()).hexdigest()
        return out

    def cell_of(f):
        m = re.search(r"cell=(\d+)", f)
        return int(m.group(1)) if m else None

    before = rows()
    snap0 = snapshot()
    tomb_path = ivf_apply_tombstones(spark, path)
    assert snapshot() == snap0, "tombstoning touched index files"

    tomb = spark.read.parquet(tomb_path)
    tomb_ids = {r["vec_id"] for r in tomb.select("vec_id").collect()}
    affected = {int(r["cell"]) for r in tomb.select("cell").distinct().collect()}
    assert tomb_ids == {v for v, _, _ in before if v % _DELETE_MOD == _DELETE_RES}
    via_anti = sorted(
        (r["vec_id"], r["cell"], r["e_norm"])
        for r in spark.read.parquet(path)
        .join(tomb.select("vec_id"), "vec_id", "left_anti")
        .select("vec_id", F.col("cell").cast("bigint").alias("cell"), "e_norm")
        .collect()
    )

    ivf_compact_deletes(spark, path, tomb_path)
    snap1 = snapshot()
    for f, dig in snap0.items():
        if cell_of(f) not in affected:
            assert snap1.get(f) == dig, f"unaffected file changed: {f}"
        else:
            assert f not in snap1, f"affected-cell file survived compaction: {f}"
    assert not os.path.exists(tomb_path), "sidecar not cleared"
    after = rows()
    assert after == via_anti
    assert after == [t for t in before if t[0] not in tomb_ids]


def test_ivf_delete_compact_probe_is_partition_pruned(spark):
    """Same plan contract as the add twin: the compacted index scan must
    prune to the probed cells at plan time and broadcast the query side."""
    from real_time_fraud_detection_system_using_big_data_analytics_spark.plans import (
        registry,
    )
    from real_time_fraud_detection_system_using_big_data_analytics_spark.plans.explain import (
        plan_string,
    )

    registry.load_all()
    df = registry.QUERIES["ann_ivf_delete_compact"](spark, SF)
    plan = plan_string(df)
    assert "PartitionFilters" in plan, plan
    assert "cell" in plan.split("PartitionFilters")[1][:300], plan
    assert "CartesianProduct" not in plan, plan


def test_stream_ingest_equals_batch_probe(spark):
    """The streaming crawl-ingest (2 foreachBatch probes against the
    persisted index) must emit EXACTLY the one-shot batch probe's pairs —
    the streaming and batch read paths of the same index agree, and no
    batch was dropped or double-probed."""
    from real_time_fraud_detection_system_using_big_data_analytics_spark.operators.dedup import (
        dedup_incremental_new_shard,
        stream_incremental_dedup_ingest,
    )

    got = stream_incremental_dedup_ingest(spark, SF)
    want = dedup_incremental_new_shard(spark, SF)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
