"""Physical-plan assertions: the scale-relevant properties (pushdown,
broadcast, top-k, whole-stage codegen) hold for the headline operators —
the '.explain and iterate' loop, automated."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_fraud_detection_system_using_big_data_analytics_spark.plans.explain import (
    assert_in_plan,
    assert_not_in_plan,
    plan_string,
)
from real_time_fraud_detection_system_using_big_data_analytics_spark.plans import registry

registry.load_all()
SF = "/root/testdata/sf0.001"


def test_q1_filter_pushed_to_parquet_scan(spark):
    df = registry.QUERIES["q1_pricing_summary"](spark, SF)
    plan = assert_in_plan(df, "PushedFilters", "HashAggregate")
    assert "l_shipdate" in plan.split("PushedFilters")[1][:200], plan


def test_equality_filter_pushdown_and_column_pruning(spark):
    df = registry.QUERIES["filter_equality"](spark, SF)
    plan = assert_in_plan(df, "PushedFilters")
    # pruned read schema: props/ts not read for this projection
    read_schema = plan.split("ReadSchema")[1][:300]
    assert "props" not in read_schema, plan


def test_dim_join_is_broadcast(spark):
    df = registry.QUERIES["join_broadcast_dim"](spark, SF)
    assert_in_plan(df, "BroadcastHashJoin")
    assert_not_in_plan(df, "SortMergeJoin")


def test_semi_anti_joins_stay_semi(spark):
    semi = registry.QUERIES["join_semi"](spark, SF)
    anti = registry.QUERIES["join_anti"](spark, SF)
    assert "LeftSemi" in plan_string(semi)
    assert "LeftAnti" in plan_string(anti)


def test_global_topk_is_take_ordered(spark):
    """orderBy+limit must compile to TakeOrderedAndProject, not a global
    sort — at 100 TB that is the difference between moving 25 rows per
    partition and sorting the table."""
    df = registry.QUERIES["sort_topk_global"](spark, SF)
    assert_in_plan(df, "TakeOrderedAndProject")


def test_union_all_has_no_shuffle(spark):
    df = registry.QUERIES["setop_union_all"](spark, SF)
    assert_not_in_plan(df, "Exchange")


def test_aggregates_are_partial(spark):
    """Grouped aggregation plans as partial_+final HashAggregate (map-side
    combine before the shuffle)."""
    df = registry.QUERIES["agg_grouped_summary"](spark, SF)
    plan = plan_string(df, mode="simple")
    assert plan.count("HashAggregate") >= 2, plan


def test_whole_stage_codegen_covers_scan_filter_agg(spark):
    """mode='codegen' lists the WholeStageCodegen subtrees (the formatted
    plan hides them behind the un-executed AdaptiveSparkPlan wrapper)."""
    df = registry.QUERIES["agg_conditional_single_pass"](spark, SF)
    plan = plan_string(df, mode="codegen")
    assert "WholeStageCodegen" in plan, plan


def test_asof_join_no_cartesian(spark):
    """The as-of join must plan as an equi-join on user_id (+range filter),
    never a cartesian/broadcast-nested-loop over the full tables."""
    df = registry.QUERIES["join_asof"](spark, SF)
    assert_not_in_plan(df, "CartesianProduct")


def test_correlated_exists_decorrelates_to_semi_anti(spark):
    """EXISTS / NOT EXISTS through spark.sql must decorrelate into
    semi/anti hash joins — never a per-row subquery or nested loop."""
    df = registry.QUERIES["sql_correlated_exists"](spark, SF)
    plan = plan_string(df)
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_levenshtein_block_join_no_cartesian(spark):
    """The edit-distance pairs join must hash on the blocking key; the
    quadratic comparison happens only inside each block."""
    df = registry.QUERIES["dedup_levenshtein_pairs"](spark, SF)
    assert_not_in_plan(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_tfidf_df_join_is_broadcast(spark):
    """The document-frequency side of TF-IDF broadcasts; the tf fact side
    must not shuffle for the join."""
    df = registry.QUERIES["text_tfidf_top_terms"](spark, SF)
    assert_in_plan(df, "BroadcastHashJoin")


def test_full_outer_preaggregates_before_join(spark):
    """Both sides aggregate to one row per key BEFORE the full outer join
    (aggregate-then-join: the shuffle carries customers, not orders)."""
    df = registry.QUERIES["join_full_outer"](spark, SF)
    plan = plan_string(df, mode="simple")
    join_pos = plan.find("FullOuter")
    assert join_pos != -1, plan
    after = plan[join_pos:]
    assert after.count("HashAggregate") >= 2, plan


def test_unpivot_single_scan(spark):
    """stack() unpivots in one scan — the UNION ALL formulation would
    read the table four times."""
    df = registry.QUERIES["unpivot_stack"](spark, SF)
    plan = plan_string(df, mode="simple")
    assert plan.count("Scan parquet") == 1, plan


def test_bucketed_join_has_no_shuffle(spark, tmp_path_factory):
    """Co-located joins: two tables bucketed+sorted on the join key join
    with ZERO Exchange in the plan — the storage-level answer to repeated
    fact-fact joins at 100 TB (pay the shuffle once at write time)."""
    from pyspark.sql import functions as F

    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    a = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    b = spark.range(0, 10_000).withColumn("w", F.col("id") % 7)
    for name, df in [("bk_a", a), ("bk_b", b)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .option("path", f"{warehouse}/{name}")
            .bucketBy(8, "id")
            .sortBy("id")
            .saveAsTable(name)
        )
    # disable auto-broadcast so the join planning reflects the big-big
    # case this test models (at 100 TB neither side broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bk_a").join(spark.table("bk_b"), "id")
        plan = plan_string(joined, mode="simple")
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for name in ("bk_a", "bk_b"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_partitioned_write_enables_partition_pruning(spark, tmp_path_factory):
    """write_parquet_partitioned + a partition-key filter must prune at
    plan time: the scan's PartitionFilters carries the predicate and only
    the matching directory is read (the 100 TB layout primitive)."""
    from real_time_fraud_detection_system_using_big_data_analytics_spark.sources.files import (
        write_parquet_partitioned,
    )
    from real_time_fraud_detection_system_using_big_data_analytics_spark.sources.tables import (
        load_tables,
    )
    from pyspark.sql import functions as F

    out = str(tmp_path_factory.mktemp("part")) + "/events_by_type"
    ev = load_tables(spark, SF, names=("events",))["events"]
    write_parquet_partitioned(ev, out, ["event_type"])
    back = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    plan = plan_string(back)
    assert "PartitionFilters" in plan, plan
    pf = plan.split("PartitionFilters")[1][:200]
    assert "event_type" in pf, plan
    assert back.count() == ev.filter(F.col("event_type") == "purchase").count()


_SWEEP_EXCLUDE_PREFIXES = (
    "stream_",
    "ml_",
    "dedup_cluster",
    "ann_mllib",  # r6 audit form: construct = execute (bounded-count collects)
    # r9 ADVICE: for these, construct == execute (a ~13-pass driver WHILE
    # loop of COUNT scans; a collect + 64 scratch-file writes) — exactly
    # the cost class this exclusion list exists for. Their plan shapes are
    # pinned by dedicated r9 tests instead.
    "sql_scripting_while",
    "source_binaryfile_ingest",
)


def test_diagnostic_tag_excludes_from_bench_headline():
    """The measured scale-killers are registry-tagged DIAGNOSTIC (kept as
    A/B baselines): the three uncapped wedge joins (SCALING.md slope5 22.9
    / 15.1 / r11-sf1 129.8x vs their capped twins), the fixed-block
    levenshtein (26.5x wall at 5x data), the exact radius self-join
    (slope5 13.9), and the all-pairs cosine dedup (r11-sf1 50.5x). The
    bench headline set must contain each production twin and never the
    tagged forms — asserted against bench.HEADLINE itself (not the
    DIAGNOSTIC-filtered view, which made the check vacuous; r12 ADVICE)."""
    import bench

    assert registry.DIAGNOSTIC == {
        "graph_adamic_adar",
        "graph_jaccard_neighbors",
        "graph_common_neighbors",
        "dedup_levenshtein_pairs",
        "dedup_embedding_cosine",
        "ann_range_search_radius",
    }
    for tagged, twin in [
        ("graph_adamic_adar", "graph_adamic_adar_capped"),
        ("graph_jaccard_neighbors", "graph_jaccard_neighbors_capped"),
        ("graph_common_neighbors", "graph_common_neighbors_capped"),
        ("dedup_levenshtein_pairs", "dedup_levenshtein_blocked"),
        ("dedup_embedding_cosine", "dedup_embedding_cosine_cells"),
        ("ann_range_search_radius", "ann_range_search_cells"),
    ]:
        assert tagged not in bench.HEADLINE, tagged
        assert twin in bench.HEADLINE, twin
        assert twin in registry.QUERIES, twin
    # tagged queries stay registered and oracle-checked
    for n in registry.DIAGNOSTIC:
        assert n in registry.QUERIES and n in registry.ORACLE


@pytest.mark.parametrize(
    "name",
    sorted(
        n
        for n in registry.QUERIES
        if not n.startswith(_SWEEP_EXCLUDE_PREFIXES)
    ),
)
def test_no_query_plans_a_cartesian_product(spark, name):
    """Sweeping invariants over every registered plan: (1) NO query may
    plan a CartesianProduct — intentional small-side crosses (ANN
    scoring) must be broadcast nested-loop, never a shuffled cartesian;
    (2) NO query may plan an Expand except the ones whose SEMANTICS are
    Expand (cube/rollup/grouping sets, and the column profiler whose
    docstring declares its exact-NDV expand). The r9 shuffle audit caught
    q21 silently planning an Expand from two countDistinct in one
    aggregate — every lineitem row doubled through the exchange; this
    sweep makes that class unreintroducible anywhere in the registry.
    Streaming/ML/iterative queries are excluded only because
    constructing them executes them — their shapes are pinned by their
    own tests."""
    df = registry.QUERIES[name](spark, SF)
    plan = plan_string(df, mode="simple")
    assert "CartesianProduct" not in plan
    expand_ok = {
        "agg_cube",
        "agg_rollup",
        "agg_grouping_sets",
        "timeseries_multi_rollup",
        "profile_column_stats",
    }
    if name not in expand_ok:
        assert "Expand" not in plan, f"{name} plans an Expand (multi-distinct agg?)"


def test_bruteforce_topk_partial_limit_below_exchange(spark):
    """ann_bruteforce_topk must be two-phase: the partial WindowGroupLimit
    (map-side per-query top-5 cut) sits BELOW the q_id Exchange, so the
    shuffle carries ≤ 5×Q rows per partition — never the Q×N scored cross.
    The tree prints root-first, so Final < Exchange < Partial positionally.
    Since r14 the scoring itself is the Arrow kernel (MapInArrow below the
    partial cut — the bounded query set is driver-held, so no join node of
    any kind may appear), and the kernel's input scan must stay pruned to
    (vec_id, embedding)."""
    df = registry.QUERIES["ann_bruteforce_topk"](spark, SF)
    plan = plan_string(df, mode="simple")
    assert plan.count("WindowGroupLimit") == 2, plan
    final_pos = plan.find("row_number(), 5, Final")
    exch_pos = plan.find("Exchange hashpartitioning(q_id")
    partial_pos = plan.find("row_number(), 5, Partial")
    assert 0 <= final_pos < exch_pos < partial_pos, plan
    assert "MapInArrow" in plan[partial_pos:], plan
    assert "Join" not in plan, plan
    full = plan_string(df)
    assert "ReadSchema: struct<vec_id:bigint,embedding:array<float>>" in full, full


def test_int8_quantization_materialized_below_exchange(spark):
    """The int8 copy must be computed once per vector below the fan-out
    exchange — FLOOR appears exactly once in the plan (the corpus branch;
    since r14 the bounded query side's q8 is collected by a separate tiny
    job from the SAME quantization expression, so it no longer appears
    here), never inlined into the per-pair coarse dot (the CollapseProject
    trap). The coarse scoring is the Arrow kernel with its per-batch
    top-20 cut; the rank windows must still carry a partial
    WindowGroupLimit below the q_id exchange."""
    df = registry.QUERIES["ann_int8_rerank"](spark, SF)
    plan = plan_string(df)
    assert plan.upper().count("FLOOR") == 1, plan
    assert "MapInArrow" in plan, plan
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan


def test_cdc_diff_is_one_full_outer_smj(spark):
    """The snapshot diff is ONE full-outer sort-merge join: each snapshot
    shuffles exactly once on the key, the delta classification is a
    project on the join output, and the summary aggregate is partial
    (map-side combine) before its own exchange."""
    df = registry.QUERIES["cdc_snapshot_diff"](spark, SF)
    plan = plan_string(df, mode="simple")
    assert "SortMergeJoin" in plan and "FullOuter" in plan, plan
    assert plan.count("Join") == 1, plan
    join_pos = plan.find("FullOuter")
    # two snapshot exchanges below the join, one agg exchange above
    assert plan[join_pos:].count("Exchange") == 2, plan
    assert plan[:join_pos].count("Exchange") == 1, plan


def test_merge_upsert_source_preaggregated(spark):
    """MERGE's source side collapses to one row per key BEFORE the full
    outer join (partial+final HashAggregate below the join), so the join
    carries customer-grain rows, never the raw orders fact table."""
    df = registry.QUERIES["merge_upsert"](spark, SF)
    plan = plan_string(df, mode="simple")
    join_pos = plan.find("FullOuter")
    assert join_pos != -1, plan
    assert plan[join_pos:].count("HashAggregate") >= 2, plan


def test_entropy_single_fact_pass(spark):
    """Entropy normalizes per-source probabilities with a window over the
    (source, lang) count table — the documents fact table is scanned
    exactly once."""
    df = registry.QUERIES["corpus_entropy_by_source"](spark, SF)
    plan = plan_string(df, mode="simple")
    assert plan.count("Scan parquet") == 1, plan


def test_pack_sequences_single_window_pass(spark):
    """Packing is one window pass: a single scan, a single sort for the
    cumulative offset, then partial aggregation on (lang, bin)."""
    df = registry.QUERIES["text_pack_sequences"](spark, SF)
    plan = plan_string(df, mode="simple")
    assert plan.count("Scan parquet") == 1, plan
    assert "Window" in plan, plan


def test_pagerank_topk_is_take_ordered(spark):
    """The PageRank result is a top-k: per-partition heap merge
    (TakeOrderedAndProject), never a global sort of all node ranks."""
    df = registry.QUERIES["graph_pagerank_bipartite"](spark, SF)
    assert_in_plan(df, "TakeOrderedAndProject")


def test_pagerank_edges_materialized_once(spark):
    """The persisted edge list must actually be HIT: every iteration reads
    the InMemoryRelation instead of replaying the fact-table join (the
    iterative-plan recomputation trap). 3 iterations × (contrib join +
    nothing else touching edges) → ≥ 3 InMemoryTableScan occurrences, and
    the lineitem/orders fact join must appear at most once outside the
    cached subtree."""
    df = registry.QUERIES["graph_pagerank_bipartite"](spark, SF)
    plan = plan_string(df, mode="simple")
    assert plan.count("InMemoryTableScan") >= 3, plan


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """When the dim side is too big to broadcast, Spark injects a runtime
    bloom filter built from the selective dim keys into the fact scan —
    the shuffle-join equivalent of dynamic partition pruning. At 100 TB
    this is what keeps a selective dim filter from paying a full fact
    shuffle. (Thresholds are test-tuned: broadcast disabled to force the
    shuffle join, application-side scan floor dropped to fire at KB
    scale.)"""
    saved = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        ),
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        o = spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        plan = plan_string(j)
        assert "bloom" in plan.lower(), plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_decontaminate_benchmark_side_is_broadcast(spark):
    """The benchmark shingle set is eval-set-sized (tiny vs the corpus):
    it must broadcast onto the corpus shingle stream — a corpus-side
    shuffle before the join would move TBs at production scale."""
    df = registry.QUERIES["curation_decontaminate"](spark, SF)
    plan = plan_string(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_pii_scrub_is_shuffle_free(spark):
    """Per-row regexp scrubbing must stay map-only: no Exchange anywhere."""
    df = registry.QUERIES["curation_pii_scrub"](spark, SF)
    assert_not_in_plan(df, "Exchange")


def test_mix_sample_gate_is_pre_shuffle(spark):
    """The hash gate runs before the audit agg's single exchange — the
    only shuffle carries (source, kept), never document text."""
    df = registry.QUERIES["curation_mix_weighted_sample"](spark, SF)
    plan = plan_string(df)
    assert plan.count("Exchange") <= 2, plan  # partial agg + final agg exchange
    read_schema = plan.split("ReadSchema")[1][:300]
    assert "text" not in read_schema, plan


def test_shard_assignment_balanced(spark):
    """16-shard multiplicative-hash assignment: every shard populated and
    no shard more than 3x the mean doc count (the skew audit a real
    reshard job runs before writing)."""
    rows = registry.QUERIES["curation_shard_assignment"](spark, SF).collect()
    assert len(rows) == 16
    counts = [r["n_docs"] for r in rows]
    mean = sum(counts) / len(counts)
    assert max(counts) <= 3 * mean, counts


def test_ivf_kmeans_probe_is_broadcast_equijoin(spark):
    """The IVF probe restricts each query to its probe cells INSIDE the
    Arrow scorer (r14 — the probe-cell mask replaced the broadcast cell
    equi-join; the driver already held both the queries and the
    centroids), cut to the per-batch top-3 before the q_id exchange. The
    corpus side must never shuffle for the probe and no join node of any
    kind may appear."""
    df = registry.QUERIES["ann_ivf_kmeans"](spark, SF)
    plan = plan_string(df)
    assert "MapInArrow" in plan, plan
    assert "Join" not in plan, plan
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan


def test_ivf_nprobe2_probe_is_broadcast_equijoin(spark):
    """nprobe=2 must keep the exact nprobe=1 plan shape: the wider probe
    list is purely a wider per-query cell mask inside the same Arrow
    scorer — no cartesian, no corpus shuffle, no join."""
    df = registry.QUERIES["ann_ivf_kmeans_nprobe2"](spark, SF)
    plan = plan_string(df)
    assert "MapInArrow" in plan, plan
    assert "Join" not in plan, plan
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan


def test_etl_prune_registry_query_has_partition_filters(spark):
    """The oracle-checked registry twin of the partition-pruning exhibit:
    the read-back scan must carry the event_type predicate as a
    PartitionFilter (plan-time directory pruning, not a data filter)."""
    df = registry.QUERIES["etl_partitioned_write_prune"](spark, SF)
    plan = plan_string(df)
    assert "PartitionFilters" in plan, plan
    assert "event_type" in plan.split("PartitionFilters")[1][:300], plan


def test_bucketed_registry_join_has_no_join_exchange(spark):
    """join_bucketed_no_shuffle: the SMJ over the two bucketed tables must
    have no Exchange below it — the only hashpartitioning allowed in the
    plan is the final groupBy on c_mktsegment."""
    df = registry.QUERIES["join_bucketed_no_shuffle"](spark, SF)
    plan = plan_string(df, mode="simple")
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning(o_custkey" not in plan, plan
    assert "Exchange hashpartitioning(c_custkey" not in plan, plan


def test_salted_join_output_hides_salt_and_spreads_keys(spark):
    """join_skew_salted: the salt column must not leak into the output
    schema, and the physical join key must be the (key, salt) composite —
    visible as both columns in the join's Exchange."""
    df = registry.QUERIES["join_skew_salted"](spark, SF)
    assert "__salt" not in df.columns
    plan = plan_string(df, mode="simple")
    assert "__salt" in plan, plan


def test_market_basket_self_join_is_equi_not_cartesian(spark):
    df = registry.QUERIES["market_basket_pairs"](spark, SF)
    plan = plan_string(df, mode="simple")
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_persisted_ivf_probe_scan_is_partition_pruned(spark):
    """ann_ivf_persisted_probe: the index scan must carry the probe-cell
    IN-filter as a PartitionFilter (plan-time directory pruning); scoring
    is the Arrow probe kernel (r14), so no join node may appear."""
    df = registry.QUERIES["ann_ivf_persisted_probe"](spark, SF)
    plan = plan_string(df)
    assert "PartitionFilters" in plan, plan
    assert "cell" in plan.split("PartitionFilters")[1][:300], plan
    assert "MapInArrow" in plan, plan
    assert "Join" not in plan, plan


def test_dynamic_partition_pruning_subquery_on_fact_scan(spark):
    """etl_dynamic_partition_pruning: the fact scan must carry a runtime
    dynamicpruning subquery fed by the filtered dim (not a static filter,
    not an unpruned scan)."""
    df = registry.QUERIES["etl_dynamic_partition_pruning"](spark, SF)
    plan = plan_string(df)
    assert "dynamicpruning" in plan.lower(), plan


def test_interval_overlap_is_bucketed_equi_join(spark):
    """join_interval_overlap must pair sessions via the hour-bucket equi
    key — never a cartesian/pure-theta join — and keep top-k as
    TakeOrderedAndProject."""
    df = registry.QUERIES["join_interval_overlap"](spark, SF)
    plan = plan_string(df, mode="simple")
    assert "CartesianProduct" not in plan, plan
    assert "bucket" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_tpch_classics_broadcast_dims_no_smj(spark):
    """Q5/Q10/Q17: every dimension side must broadcast — the fact table
    (lineitem) shuffles only for its own aggregation keys, never to meet
    a dimension in a sort-merge join."""
    for name in (
        "q5_local_supplier_volume",
        "q10_returned_items",
        "q17_small_quantity_revenue",
    ):
        df = registry.QUERIES[name](spark, SF)
        plan = plan_string(df)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_q6_is_pure_scan_agg_with_pushdown(spark):
    """Q6: zero joins; date/discount/quantity predicates reach the scan."""
    df = registry.QUERIES["q6_forecast_revenue"](spark, SF)
    plan = plan_string(df)
    assert "Join" not in plan, plan
    assert "PushedFilters" in plan


def test_q10_topk_is_take_ordered(spark):
    assert_in_plan(
        registry.QUERIES["q10_returned_items"](spark, SF), "TakeOrderedAndProject"
    )


def test_rolling_distinct_explodes_then_broadcast_semi(spark):
    """The explode-contribution rewrite: a Generate (in-row explode) and a
    broadcast semi-join against the observed-day set — no sort-merge, no
    cartesian, no window."""
    df = registry.QUERIES["window_rolling_distinct_users"](spark, SF)
    plan = plan_string(df)
    assert "Generate" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_zorder_is_joinless_single_pass(spark):
    """Morton interleave is per-row arithmetic: one scan, one aggregate,
    no join anywhere."""
    plan = plan_string(registry.QUERIES["layout_zorder_bucketing"](spark, SF))
    assert "Join" not in plan, plan


def test_ewma_is_single_grouped_pandas_pass(spark):
    """The per-key recurrence runs as ONE MapInPandas over one shuffle on
    the key plus a partition-local sort — no window, no self-join, and
    one Python invocation per partition (not per key)."""
    plan = plan_string(registry.QUERIES["udf_ewma_stateful"](spark, SF), mode="simple")
    assert plan.count("MapInPandas") == 1, plan
    assert "Window" not in plan
    assert "Join" not in plan
    assert plan.count("Exchange") == 1, plan


def test_downsample_last_avoids_window(spark):
    """'Last observation per bucket' must be the mergeable max_by
    aggregate, not a row_number window (which pays a per-key sort)."""
    plan = plan_string(registry.QUERIES["timeseries_downsample_last"](spark, SF))
    assert "Window" not in plan, plan


def test_recursive_cte_plans_union_loop(spark):
    """WITH RECURSIVE compiles to the native UnionLoop execution node (one
    frontier join per level), not a driver-side unrolling."""
    plan = plan_string(registry.QUERIES["sql_recursive_hierarchy"](spark, SF))
    assert "UnionLoop" in plan, plan


def test_incremental_merge_unions_partial_states(spark):
    """Base+delta maintenance: two partial aggregates union below the
    final merge aggregate — the fact scan appears per segment with its
    segment filter pushed down."""
    df = registry.QUERIES["etl_incremental_agg_merge"](spark, SF)
    plan = plan_string(df)
    assert "Union" in plan
    assert "PushedFilters" in plan


def test_q2_rank_filter_has_partial_group_limit(spark):
    """Q2's min-cost-supplier rank filter must cut each partition to one
    row per part below the exchange (partial WindowGroupLimit), and the
    dimension chain must broadcast — no SortMergeJoin anywhere."""
    df = registry.QUERIES["q2_min_cost_supplier"](spark, SF)
    plan = plan_string(df, mode="simple")
    assert "row_number(), 1, Partial" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_q19_quantity_bound_reaches_scan(spark):
    """The explicit enclosing quantity bound (BETWEEN 1 AND 30, implied by
    the OR brackets) must be pushed to the lineitem parquet scan — without
    it the disjunction forces a full read."""
    df = registry.QUERIES["q19_discounted_revenue"](spark, SF)
    plan = plan_string(df)
    pushed = plan.split("PushedFilters")[1][:300]
    assert "l_quantity" in pushed, plan


def test_q21_exists_pair_is_one_aggregate_plus_semi(spark):
    """Q21's EXISTS/NOT-EXISTS double correlation must compile to the
    aggregate-then-semi-join form: one per-order aggregate and a LeftSemi
    probe — never a per-row correlated re-scan (no cartesian, no
    nested-loop on the fact side)."""
    df = registry.QUERIES["q21_waiting_suppliers"](spark, SF)
    plan = plan_string(df, mode="simple")
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    # r9 (found by tests/shuffle_audit.py): two countDistinct in one agg
    # planned an Expand that doubled every lineitem row through the
    # exchange (20.4 -> 11.7 MB shuffled at sf0.1 after the two-level
    # aggregate rewrite). Expand must never reappear in this plan.
    assert "Expand" not in plan, plan


def test_pq_adc_partial_limit_no_smj(spark):
    """The PQ-ADC scan must keep the brute-force shape: partial
    WindowGroupLimit cuts each partition to top-5 per query below the
    exchange, and no SortMergeJoin appears anywhere (codes ride the
    corpus scan; queries broadcast with their LUTs)."""
    df = registry.QUERIES["ann_pq_adc"](spark, SF)
    plan = plan_string(df, mode="simple")
    assert "row_number(), 5, Partial" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_bloom_prune_filters_fact_before_join(spark):
    """The bloom bitmap membership tests must sit in a Filter on the
    lineitem side BELOW the join — that pre-shuffle prune is the entire
    point of the operator."""
    df = registry.QUERIES["join_bloom_filter_pruned"](spark, SF)
    plan = plan_string(df)
    assert "BroadcastHashJoin" in plan, plan
    # the bitmap membership test must be a Filter Condition on the
    # l_orderkey column (the fact-side scan), not a post-join projection
    filter_conds = [
        seg.split("\n")[0]
        for seg in plan.split("Condition : ")[1:]
    ]
    assert any(
        "element_at" in c and "l_orderkey" in c for c in filter_conds
    ), plan[:2000]


def test_skyline_frontier_join_is_broadcast_no_cartesian(spark):
    df = registry.QUERIES["skyline_pareto"](spark, SF)
    plan = plan_string(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan, plan


def test_interval_coverage_single_shuffle_on_custkey(spark):
    """All three windows + the island rollup share the o_custkey hash
    partitioning: exactly ONE Exchange over the orders scan."""
    df = registry.QUERIES["interval_coverage_merge"](spark, SF)
    plan = plan_string(df, mode="simple")
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 1, f"expected 1 hash exchange, got {n_exchange}\n{plan}"


def test_radius_join_prunes_with_prefix_bound_no_smj(spark):
    df = registry.QUERIES["ann_range_search_radius"](spark, SF)
    plan = plan_string(df)
    assert "SortMergeJoin" not in plan, plan


def test_attribution_single_user_shuffle(spark):
    df = registry.QUERIES["attribution_last_touch"](spark, SF)
    plan = plan_string(df, mode="simple")
    assert plan.count("Exchange hashpartitioning(user_id") <= 1, plan


def test_rfm_single_orders_shuffle_before_ntile(spark):
    """The orders fact shuffles once (o_custkey rollup); the NTILE windows
    run over the customer-cardinality rollup."""
    df = registry.QUERIES["rfm_segmentation"](spark, SF)
    plan = plan_string(df, mode="simple")
    assert plan.count("Exchange hashpartitioning(o_custkey") == 1, plan


def test_gdpr_cascade_anti_semi_broadcast(spark):
    df = registry.QUERIES["gdpr_delete_propagation"](spark, SF)
    plan = plan_string(df)
    assert "LeftAnti" in plan and "LeftSemi" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_cumulative_reset_stacked_windows_share_partitioning(spark):
    """segment-id window + within-segment running sum + per-user rollup
    must reuse ONE user_id Exchange (the finer window key refines the
    coarser partitioning)."""
    df = registry.QUERIES["window_cumulative_reset"](spark, SF)
    plan = plan_string(df, mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_markov_transitions_single_user_shuffle(spark):
    df = registry.QUERIES["eventflow_markov_transitions"](spark, SF)
    plan = plan_string(df, mode="simple")
    assert plan.count("Exchange hashpartitioning(user_id") <= 1, plan


def test_asof_nearest_is_joinless(spark):
    """Two-sided nearest alignment must be pure windows — no join
    operator of any kind in the plan."""
    df = registry.QUERIES["join_asof_nearest"](spark, SF)
    plan = plan_string(df, mode="simple")
    for frag in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert frag not in plan, plan


def test_bitmap_distinct_words_aggregate_is_partial(spark):
    """The bitmap OR must partial-aggregate map-side (mergeable state is
    the operator's whole point)."""
    df = registry.QUERIES["agg_bitmap_exact_distinct"](spark, SF)
    plan = plan_string(df, mode="simple")
    assert plan.count("HashAggregate") >= 4, plan


def test_lpa_edges_not_reshuffled_per_round(spark):
    """Labels broadcast into each LPA round: the persisted edge list must
    never appear under an Exchange keyed on src."""
    df = registry.QUERIES["graph_label_propagation"](spark, SF)
    plan = plan_string(df, mode="simple")
    assert "BroadcastHashJoin" in plan, plan


def test_structuring_band_filter_pushed_single_user_shuffle(spark):
    """The sub-threshold band filter must reach the parquet scan (the
    whole point at scale: <5% of rows survive before the only shuffle),
    and the rolling window must cost exactly one user_id Exchange."""
    df = registry.QUERIES["fraud_structuring_subthreshold"](spark, SF)
    plan = plan_string(df)
    assert "PushedFilters" in plan and "value" in plan.split("PushedFilters")[1][:200], plan
    simple = plan_string(df, mode="simple")
    assert simple.count("Exchange hashpartitioning(user_id") == 1, simple


def test_cusum_stacked_windows_share_one_user_shuffle(spark):
    """Running-sum then running-min-of-sum share partitioning AND ordering
    — the closed-form CUSUM must not pay a second Exchange or Sort."""
    df = registry.QUERIES["fraud_cusum_drift"](spark, SF)
    simple = plan_string(df, mode="simple")
    assert simple.count("Exchange hashpartitioning(user_id") == 1, simple
    assert simple.count("Sort [user_id") == 1, simple


def test_target_encoding_broadcasts_category_stats(spark):
    """Category stats and the 1-row global prior broadcast back onto the
    fact scan — the fact rows themselves must never hash-shuffle."""
    df = registry.QUERIES["feature_target_encoding_loo"](spark, SF)
    simple = plan_string(df, mode="simple")
    assert simple.count("BroadcastHashJoin") >= 1, simple
    assert "BroadcastNestedLoopJoin" in simple, simple  # 1-row global cross
    assert "SortMergeJoin" not in simple, simple


def test_pr_auc_window_runs_on_collapsed_scores(spark):
    """The cumulative window must consume the per-score aggregate, not raw
    events: a partial+final HashAggregate pair precedes the single-
    partition window Exchange."""
    df = registry.QUERIES["ml_pr_auc"](spark, SF)
    simple = plan_string(df, mode="simple")
    assert simple.count("HashAggregate") >= 4, simple
    assert simple.index("HashAggregate") < simple.index("Window"), simple


def test_textrank_cooccurrence_is_joinless_and_edges_cached(spark):
    """Distance-≤2 co-occurrence must come from LEAD windows, not a token
    self-join; rounds broadcast the score table against the persisted
    edge list (no per-round src re-shuffle)."""
    df = registry.QUERIES["text_textrank_keywords"](spark, SF)
    simple = plan_string(df, mode="simple")
    assert "BroadcastHashJoin" in simple, simple
    assert "InMemoryTableScan" in simple, simple
    assert "CartesianProduct" not in simple, simple


def test_jaccard_neighbors_no_broadcast_of_node_cardinality_side(spark):
    """Degree/candidate joins are node-cardinality: no explicit broadcast
    hint — and top-20 compiles to TakeOrderedAndProject, not a global
    sort."""
    df = registry.QUERIES["graph_jaccard_neighbors"](spark, SF)
    simple = plan_string(df, mode="simple")
    assert "TakeOrderedAndProject" in simple, simple
    assert "CartesianProduct" not in simple, simple


def test_seasonal_decompose_collapses_before_windows(spark):
    """The (type × day) aggregate must precede the trend window, and the
    tiny seasonal table broadcasts back."""
    df = registry.QUERIES["timeseries_seasonal_decompose"](spark, SF)
    simple = plan_string(df, mode="simple")
    # the trend window reads the aggregated daily series, never raw events
    assert "sum(total_cents" in simple.split("Window")[1], simple
    assert "BroadcastHashJoin" in simple, simple


def test_join_ivm_delta_sides_broadcast(spark):
    """Every cross term joins through a broadcast of its delta side —
    maintenance cost must scale with |delta|, so no SortMergeJoin may
    appear anywhere in the maintenance plan."""
    df = registry.QUERIES["etl_join_ivm_delta"](spark, SF)
    simple = plan_string(df, mode="simple")
    assert simple.count("BroadcastHashJoin") >= 3, simple


def test_filtered_topk_restricts_before_scoring(spark):
    """The label restriction applies BEFORE ranking (post-filtering
    under-fills k): since r14 it is the per-query equality mask inside the
    Arrow scorer (the kernel cuts each batch top-5 AMONG matching rows
    only), and the partial WindowGroupLimit must still cut below the q_id
    Exchange."""
    df = registry.QUERIES["ann_filtered_topk"](spark, SF)
    simple = plan_string(df, mode="simple")
    assert "MapInArrow" in simple, simple
    assert "Join" not in simple, simple
    assert "WindowGroupLimit" in simple, simple
    assert simple.index("Exchange hashpartitioning(q_id") < simple.rindex("WindowGroupLimit"), simple


def test_auc_ranksum_window_on_collapsed_scores(spark):
    """The midrank window must consume the per-score aggregate, never raw
    events (window input bounded by score granularity)."""
    df = registry.QUERIES["ml_auc_exact_ranksum"](spark, SF)
    simple = plan_string(df, mode="simple")
    assert simple.count("HashAggregate") >= 4, simple
    assert "sum(n#" in simple.split("Window")[1][:300], simple


def test_threshold_sweep_single_aggregate_no_shuffle_of_facts(spark):
    """All 27 confusion cells in one aggregate pass: exactly one
    hashpartitioning-free global agg + the stack projection."""
    df = registry.QUERIES["ml_threshold_sweep"](spark, SF)
    simple = plan_string(df, mode="simple")
    assert "Exchange hashpartitioning" not in simple, simple
    assert simple.count("Scan parquet") == 1, simple


def test_share_shift_customer_dim_broadcast(spark):
    df = registry.QUERIES["olap_share_shift"](spark, SF)
    simple = plan_string(df, mode="simple")
    assert "BroadcastHashJoin" in simple, simple
    assert "SortMergeJoin" not in simple, simple


def test_mirror_trades_blocked_join_no_cartesian(spark):
    """Pair expansion must block on the (hour, cents) equi-key — never a
    cartesian or nested-loop over accounts."""
    df = registry.QUERIES["fraud_mirror_trades"](spark, SF)
    simple = plan_string(df, mode="simple")
    assert "CartesianProduct" not in simple, simple
    assert "BroadcastNestedLoopJoin" not in simple, simple


def test_drawdown_windows_share_one_user_shuffle(spark):
    """Running balance + running peak + final rollup: one user_id
    Exchange, one Sort (the CUSUM-mirror plan shape)."""
    df = registry.QUERIES["window_max_drawdown"](spark, SF)
    simple = plan_string(df, mode="simple")
    assert simple.count("Exchange hashpartitioning(user_id") == 1, simple
    assert simple.count("Sort [user_id") == 1, simple


def test_vwap_collapses_to_daily_grid(spark):
    """One partial+final aggregate pair; the weighted sum must happen in
    the aggregate (no window, no join)."""
    df = registry.QUERIES["timeseries_vwap_daily"](spark, SF)
    simple = plan_string(df, mode="simple")
    assert simple.count("HashAggregate") >= 2, simple
    assert "Window" not in simple and "Join" not in simple, simple


def test_tfidf_cosine_df_band_before_pair_join(spark):
    """The df-band filter must restrict term lists BEFORE the shared-term
    pair join (it is the skew guard), and no cartesian may appear."""
    df = registry.QUERIES["text_tfidf_cosine_pairs"](spark, SF)
    simple = plan_string(df, mode="simple")
    assert "CartesianProduct" not in simple, simple
    assert "TakeOrderedAndProject" in simple, simple


def test_shortest_path_frontier_broadcast_per_round(spark):
    """Each relaxation round joins the broadcast frontier against the
    persisted edge list — the edge side must never hash-shuffle on src."""
    df = registry.QUERIES["graph_shortest_path_bounded"](spark, SF)
    simple = plan_string(df, mode="simple")
    assert simple.count("BroadcastHashJoin") >= 3, simple
    assert "InMemoryTableScan" in simple, simple


def test_hits_rounds_reuse_edges(spark):
    """Three propagation joins (h->a->h->a) against the same persisted
    edge aggregate; scores broadcast each round."""
    df = registry.QUERIES["graph_hits_hubs_authorities"](spark, SF)
    simple = plan_string(df, mode="simple")
    assert simple.count("BroadcastHashJoin") >= 3, simple
    assert "InMemoryTableScan" in simple, simple


def test_no_private_jvm_api_in_operators():
    """r5 verdict nit 3, kept closed: no operator reaches through the
    private py4j gateway (spark._jvm) — it breaks under Spark Connect.
    The CMS audit was rewritten relationally in r6; this pins the whole
    operators/ package so the pattern cannot creep back."""
    from pathlib import Path

    import real_time_fraud_detection_system_using_big_data_analytics_spark.operators as ops

    root = Path(ops.__file__).parent
    offenders = [
        p.name for p in root.glob("*.py") if "spark._jvm." in p.read_text()
    ]
    assert offenders == [], offenders


def test_cms_audit_sketch_is_broadcast_relation(spark):
    """The r6 relational CMS: the d x w counter table (bounded by
    construction) must reach the probe via a broadcast hash join, and the
    plan must contain no cartesian product and no Python eval node."""
    df = registry.QUERIES["agg_cms_heavy_hitter_audit"](spark, SF)
    plan = plan_string(df, mode="simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan, plan


def test_dim_truncation_recall_bounded_query_side(spark):
    """ann_dim_truncation_recall shares ann_bruteforce_topk's bounded-Q
    discipline: since r14 the bounded query set is driver-held and both
    cosines come from ONE Arrow pass — the plan must carry the kernel and
    no join node, and the kernel scan stays pruned to (vec_id,
    embedding)."""
    df = registry.QUERIES["ann_dim_truncation_recall"](spark, SF)
    full = plan_string(df)
    assert "MapInArrow" in full, full
    assert "Join" not in full, full
    assert "ReadSchema: struct<vec_id:bigint,embedding:array<float>>" in full, full


def test_approx_percentile_audit_broadcasts_group_medians(spark):
    """The audit's second pass joins group-cardinality approx medians back
    over the fact scan — that side must broadcast, never shuffle the
    fact table on event_type."""
    df = registry.QUERIES["agg_approx_percentile_audit"](spark, SF)
    plan = plan_string(df, mode="simple")
    assert "BroadcastHashJoin" in plan, plan


def test_ivfpq_cell_join_is_broadcast_no_cartesian(spark):
    """ann_ivf_pq_shortlist_rerank: the ADC stage must reach the corpus
    via a broadcast equi-join on the cell id (queries side is the bounded
    sample), never a cartesian; the exact rerank joins only the shortlist
    back to full vectors."""
    df = registry.QUERIES["ann_ivf_pq_shortlist_rerank"](spark, SF)
    plan = plan_string(df, mode="simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_decontaminate_bloom_prefilter_is_scan_side(spark):
    """curation_decontaminate_bloom: the Bloom membership test must appear
    as a bitwise filter (shiftleft masks against the literal bitmap) in
    the plan BEFORE the exact shingle join — the join input is the
    surviving fraction, not the full (doc, shingle) expansion."""
    df = registry.QUERIES["curation_decontaminate_bloom"](spark, SF)
    plan = plan_string(df)
    assert "shiftleft" in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan_string(df, mode="simple")


FORCED_SMJ_QUERIES = [
    "join_multiway_revenue",
    "q9_product_type_profit",
    "q18_large_volume_customers",
    "q21_waiting_suppliers",
    "cdc_snapshot_diff",
]


@pytest.mark.parametrize("name", FORCED_SMJ_QUERIES)
def test_forced_smj_degradation_oracle_green(spark, name):
    """r7 verdict task 5: SCALE.md promises the heaviest joins survive
    the no-broadcast regime ('the unhinted sides are designed for exactly
    that degradation') — at 100 TB the planner cannot auto-broadcast
    anything, so with spark.sql.autoBroadcastJoinThreshold=-1 every
    UNHINTED join must degrade to a sort-merge join and the answer must
    not change. This pins both halves: the degraded plan contains a
    SortMergeJoin (the fact-fact path really left the broadcast regime;
    explicit F.broadcast() dim hints legitimately survive — a hint is a
    promise of boundedness, not a statistics guess), and the result still
    hash-matches the DuckDB oracle at sf0.01. Also run one-off at sf0.1
    (BENCH_NOTES_r8.md)."""
    from tests.oracle_harness import compare

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = registry.QUERIES[name](spark, "/root/testdata/sf0.01")
        plan = plan_string(df, mode="simple")
        assert "SortMergeJoin" in plan, plan
        rep = compare(
            spark,
            registry.QUERIES[name],
            registry.ORACLE[name],
            "/root/testdata/sf0.01",
        )
        assert rep["row_match"] and rep["col_match"] and rep["type_match"], rep
        assert rep["value_match"], rep
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_pipe_syntax_plans_like_classic_sql(spark):
    """The |> dialect is surface syntax only: the orderdate filter must
    reach the parquet scan as a pushed filter and the aggregate must be
    partial (map-side combine) — the same physical shape as the classic
    GROUP BY spelling."""
    df = registry.QUERIES["sql_pipe_syntax"](spark, "/root/testdata/sf0.001")
    plan = assert_in_plan(df, "PushedFilters", "HashAggregate")
    assert "o_orderdate" in plan.split("PushedFilters")[1][:300], plan


def test_map_in_arrow_scan_is_pruned(spark):
    """udf_map_in_arrow: the Python eval node must sit on a 2-column
    pruned scan (vec_id, embedding) — binary payload discipline: nothing
    downstream of the Arrow transform re-reads or shuffles raw vectors."""
    df = registry.QUERIES["udf_map_in_arrow"](spark, "/root/testdata/sf0.001")
    plan = plan_string(df)
    assert "MapInArrow" in plan or "mapInArrow" in plan.lower(), plan[:1500]
    read = plan.split("ReadSchema")[1][:300]
    assert "vec_id" in read and "embedding" in read, read


TPCH_ALL = [n for n in registry.QUERIES if n.startswith("q") and n[1].isdigit()]


@pytest.mark.parametrize("name", sorted(TPCH_ALL))
def test_tpch_queries_have_no_python_stage(spark, name):
    """Registry-wide hot-path guarantee, codified: the entire TPC-H suite
    must plan with ZERO Python evaluation nodes (no BatchEvalPython /
    ArrowEvalPython / MapInPandas / MapInArrow / FlatMapGroupsInPandas) —
    relational queries stay inside whole-stage codegen end to end. A
    future 'helper' UDF sneaking into a shared expression would silently
    put Python in every downstream plan; this pins it out."""
    df = registry.QUERIES[name](spark, SF)
    plan = plan_string(df)
    for marker in (
        "BatchEvalPython",
        "ArrowEvalPython",
        "MapInPandas",
        "MapInArrow",
        "FlatMapGroupsInPandas",
        "PythonUDTF",
    ):
        assert marker not in plan, (name, marker)


def test_gopher_rules_stay_jvm_side_with_doc_keyed_shuffles_only(spark):
    """The r9 Gopher cascade routes its repetition counters through
    explode + map-side-combinable aggregates (the slope harness measured
    the 'shuffle-free' per-row nested-fold version at ~36 ms/doc — see
    the operator docstring); the plan contract now is: zero Python
    stages, no cartesian, and every Exchange keyed on doc_id (integer
    counters only — no shuffle ever carries document text)."""
    df = registry.QUERIES["text_gopher_quality_rules"](spark, SF)
    plan = plan_string(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan
    assert "CartesianProduct" not in plan, plan
    import re as _re

    for m in _re.finditer(r"Exchange hashpartitioning\(([^,]+)", plan):
        assert "doc_id" in m.group(1) or "tok" in m.group(1) or "bg" in m.group(1), plan


def test_semdedup_pairs_join_on_cell_not_cartesian(spark):
    """SemDeDup's scale contract: the pair expansion is an equi-join on
    the coarse cell id (within-cell pairs only), never a cartesian."""
    df = registry.QUERIES["dedup_semdedup"](spark, SF)
    plan = plan_string(df)
    assert "CartesianProduct" not in plan, plan
    assert "cell" in plan, plan


def test_dsir_lm_join_is_broadcast(spark):
    """The DSIR bucket-LM table is 16 rows by construction — it must
    broadcast onto the token stream; the corpus side shuffles only for
    the final doc-cardinality aggregate."""
    df = registry.QUERIES["curation_dsir_importance"](spark, SF)
    plan = plan_string(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_jaccard_capped_prunes_before_self_join(spark):
    """Hub capping must happen BEFORE the wedge self-join: the capped
    plan joins the adjacency list to the capped-degree keep set, and no
    cartesian appears anywhere."""
    df = registry.QUERIES["graph_jaccard_neighbors_capped"](spark, SF)
    plan = plan_string(df)
    assert "CartesianProduct" not in plan, plan


def test_hard_negative_mining_partial_topk_below_exchange(spark):
    """The negative scan must keep ann_bruteforce_topk's two-phase shape:
    a Partial WindowGroupLimit below the q_id Exchange so at most 3xQ
    rows shuffle, and the bounded anchor side broadcasts."""
    df = registry.QUERIES["ann_hard_negative_mining"](spark, SF)
    plan = plan_string(df)
    assert "WindowGroupLimit" in plan, plan
    assert "Partial" in plan.split("WindowGroupLimit")[-1][:80] or \
        plan.count("WindowGroupLimit") >= 2, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def test_sketch_agreement_no_cartesian(spark):
    """Both candidate sets come from sketch-key equi-joins and the exact
    referee runs only over the candidate universe: no cartesian product
    may appear anywhere in the plan."""
    df = registry.QUERIES["dedup_sketch_agreement"](spark, SF)
    plan = plan_string(df)
    assert "CartesianProduct" not in plan, plan


# --- Spark-4 SQL surface (r9: variables, SQL UDFs, scripting, collation,
# from_xml) — each must be pure surface syntax: no Python stage, and the
# plan shape identical to the hand-inlined spelling the oracle runs.


def test_sql_udf_scalar_is_inlined_no_python(spark):
    """CREATE FUNCTION ... RETURN bodies are analyzer-inlined: the rollup
    that calls to_cents() three times must plan with ZERO Python nodes
    and a partial (map-side combine) aggregate — byte-identical physics
    to writing CAST(FLOOR(...)) inline."""
    df = registry.QUERIES["sql_udf_scalar"](spark, SF)
    plan = plan_string(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan
    assert "HashAggregate" in plan, plan


def test_sql_session_variable_folds_to_scan_filter(spark):
    """The session variable binds a literal at analysis time, so the
    o_totalprice > half_max_price predicate must still reach the parquet
    scan as a pushed filter — variables cannot cost pushdown."""
    df = registry.QUERIES["sql_session_variables"](spark, SF)
    plan = assert_in_plan(df, "PushedFilters", "HashAggregate")
    assert "o_totalprice" in plan.split("PushedFilters")[1][:300], plan


def test_sql_table_function_lateral_decorrelates_to_join(spark):
    """The LATERAL region_nations(r.r_regionkey) call must decorrelate
    into an ordinary equi-join (hash or broadcast), never a per-row
    nested-loop invocation and never a cartesian."""
    df = registry.QUERIES["sql_udf_table_lateral"](spark, SF)
    plan = plan_string(df)
    assert "CartesianProduct" not in plan, plan
    assert (
        "BroadcastHashJoin" in plan
        or "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
    ), plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDTF"):
        assert marker not in plan, plan


def test_from_xml_roundtrip_stays_jvm_side(spark):
    """from_xml is a built-in Spark-4 expression: the serialize→parse
    round-trip must plan with zero Python evaluation nodes (contrast: an
    xml.etree pandas_udf would put Arrow transfers in the hot path)."""
    df = registry.QUERIES["scalar_from_xml_roundtrip"](spark, SF)
    plan = plan_string(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan


def test_collation_groupby_merges_case_variants(spark):
    """Semantic pin beyond the oracle: under UTF8_LCASE every source
    group must contain exactly 2 binary-distinct case variants (upper
    from even doc_ids, original from odd) — a binary-collation grouping
    would report 1 variant per (now split) group and double the group
    count."""
    rows = registry.QUERIES["scalar_collation_groupby"](spark, SF).collect()
    assert rows, "no groups"
    assert all(r.n_case_variants == 2 for r in rows), rows


def test_sql_scripting_while_terminates_with_exit_condition(spark):
    """The WHILE exit invariant, checked live: the returned threshold T
    satisfies count(> T) <= 50 AND count(> T/2) > 50 — i.e. the loop
    stopped at the FIRST power-of-two multiple meeting the condition
    (what the oracle's ORDER BY k LIMIT 1 encodes)."""
    row = registry.QUERIES["sql_scripting_while"](spark, SF).collect()[0]
    orders = spark.read.parquet(SF + "/orders.parquet")
    t = float(row.threshold)
    assert row.n_above <= 50
    if t > 100.0:
        n_half = orders.filter(F.col("o_totalprice") > t / 2).count()
        assert n_half > 50, (t, n_half)


def test_epoch_shuffle_order_partial_topk_and_broadcast_epochs(spark):
    """curation_epoch_shuffle_order: the 2-row epochs relation must
    BROADCAST onto the corpus (never shuffle docs to cross them), and the
    per-epoch top-10 must be a WindowGroupLimit partial cut below the
    epoch Exchange — at most 10 rows per partition per epoch reach the
    shuffle, corpus-size-independent."""
    df = registry.QUERIES["curation_epoch_shuffle_order"](spark, SF)
    plan = plan_string(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "WindowGroupLimit" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_epoch_shuffle_orders_differ_across_epochs(spark):
    """Semantic pin beyond the oracle: the two epochs' visit orders must
    actually DIFFER (different affine multipliers) — a broken epoch
    binding (same a_e for both) would still hash-pass a same-seed oracle,
    so pin order divergence directly."""
    rows = registry.QUERIES["curation_epoch_shuffle_order"](spark, SF).collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append((r.pos, r.doc_id))
    assert set(by_epoch) == {0, 1}, by_epoch.keys()
    order0 = [d for _, d in sorted(by_epoch[0])]
    order1 = [d for _, d in sorted(by_epoch[1])]
    assert order0 != order1, "epoch orders identical - epoch not bound"
    assert len(set(order0)) == 10 and len(set(order1)) == 10


def test_aqe_coalesces_post_shuffle_partitions_at_runtime(spark):
    """Executed-plan (not explain-time) evidence that AQE is live: the
    grouped aggregate's 32 configured shuffle partitions must coalesce at
    runtime to match the actual (tiny) reduce-side data — the
    AQEShuffleRead(coalesced) node only exists after execution. At 100 TB
    the same machinery right-sizes every reduce stage to the real map
    output instead of the static spark.sql.shuffle.partitions guess; this
    pins that the session config (adaptive.enabled +
    coalescePartitions.enabled) actually engages rather than being
    decorative."""
    df = registry.QUERIES["agg_grouped_summary"](spark, SF)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in final, final[:2000]
    assert "coalesced" in final, final[:2000]


def test_aqe_skew_join_splits_hot_partition_at_runtime(spark):
    """Executed-plan evidence that AQE skew-join handling engages: a
    synthetic relation with one hot key (1/3 of all rows) joined under
    lowered skew thresholds must show SortMergeJoin(skew=true) with an
    'AQEShuffleRead coalesced and skewed' child AFTER execution, and the
    row count must be unaffected by the split. Two non-obvious
    preconditions this test encodes: (1) skew detection reads COMPRESSED
    map-output sizes, so the hot partition's payload must be
    incompressible (sha2 pads; a constant-string pad compresses below any
    realistic threshold and the skew silently never triggers); (2) the
    rule declines when the join feeds an operator that needs the hash
    distribution (an immediate groupBy), because splitting would break
    co-partitioning — the probe output must be distribution-free. These
    are exactly the conditions under which the salting operator
    (join_skew_salted) remains necessary at 100 TB."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "200k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "200k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 300_000).select(
            (F.when(F.col("id") % 3 == 0, 0).otherwise(F.col("id")) % 1000)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k").select("k", "pad", "w")
        assert len(j.collect()) == 300_000
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final[:2000]
        assert "skewed" in final, final[:2000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_switches_smj_to_broadcast_on_runtime_stats(spark):
    """Executed-plan evidence for AQE's join-strategy re-plan: a side
    whose STATIC size estimate (file bytes; the md5-prefix filter is
    opaque to the estimator) forces SortMergeJoin must convert to
    BroadcastHashJoin at runtime once the actual post-filter map output
    measures under the adaptive broadcast threshold — and the result must
    equal the same join computed under the default (statically broadcast)
    planning. This is the re-plan that saves mis-estimated dimension
    joins at 100 TB without manual hints; together with the coalesce and
    skew pins it covers all three AQE re-optimizations the session
    factory enables."""
    ev = spark.read.parquet(SF + "/events.parquet")
    tiny = ev.filter(F.md5(F.col("props")).startswith("0")).select(
        "user_id", "event_id"
    )
    expected = ev.join(tiny.withColumnRenamed("event_id", "e2"), "user_id").count()
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10485760")
    try:
        j = ev.join(tiny.withColumnRenamed("event_id", "e2"), "user_id")
        pre = j._jdf.queryExecution().sparkPlan().toString()
        assert "SortMergeJoin" in pre, pre[:1500]
        assert len(j.collect()) == expected
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in final, final[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_binary_hamming_shortlist_partial_limit_below_exchange(spark):
    """ann_binary_hamming_rerank's Hamming shortlist must cut map-side:
    the partial WindowGroupLimit (per-query Hamming top-10) sits BELOW the
    q_id Exchange, so the shuffle carries <= 10xQ signature rows — never
    the Q x N Hamming cross — and the exact rerank only ever sees the
    joined-back shortlist."""
    df = registry.QUERIES["ann_binary_hamming_rerank"](spark, SF)
    plan = plan_string(df, mode="simple")
    final_pos = plan.find("row_number(), 10, Final")
    partial_pos = plan.find("row_number(), 10, Partial")
    assert 0 <= final_pos < partial_pos, plan
    # the shortlist's own q_id Exchange sits between its Final and Partial
    # (the rerank's exchange appears earlier in the root-first print)
    assert "Exchange hashpartitioning(q_id" in plan[final_pos:partial_pos], plan
    # and the rerank top-3 is two-phase as well
    assert plan.find("row_number(), 3, Final") < plan.find("row_number(), 3, Partial"), plan


def test_iterative_rounds_persist_in_plan(spark):
    """r12 pay-per-round-once law (SCALE.md §Graph): round state referenced
    more than once must be persist()ed — the physical plan then reads the
    round from InMemoryTableScan instead of re-deriving the whole chain
    2^rounds times (k-core measured 13.4 s → 4.8 s at sf0.1 from this
    alone). Pin the cache nodes so a refactor that drops a persist fails
    here, not in the next sf1 gate."""
    for name, min_scans in [
        ("graph_k_core_peel", 3),          # survivors: src+dst semi-joins x rounds
        ("graph_shortest_path_bounded", 2),  # frontier: union + relax per round
        ("graph_hits_hubs_authorities", 3),  # raw MAX + scaled + next round
    ]:
        df = registry.QUERIES[name](spark, SF)
        plan = plan_string(df, mode="simple")
        n = plan.count("InMemoryTableScan")
        assert n >= min_scans, f"{name}: {n} InMemoryTableScan nodes\n{plan[:2000]}"


def test_incremental_shard_dedup_probe_is_colocated(spark):
    """dedup_incremental_new_shard: the persisted signature index must be
    read as a BUCKETED scan feeding the sort-merge probe join with no
    Exchange on the index side (the corpus never shuffles — the whole
    point of the incremental op); the only bucket_key Exchange allowed is
    the shard side shuffling into the index's layout. The shard slice
    predicate must reach the documents scan, and documents must be
    scanned exactly once (a second scan would mean corpus signatures were
    recomputed)."""
    df = registry.QUERIES["dedup_incremental_new_shard"](spark, SF)
    plan = plan_string(df, mode="simple")
    assert "SortMergeJoin" in plan, plan
    assert "Bucketed: true" in plan, plan
    assert plan.count("Exchange hashpartitioning(bucket_key") == 1, plan
    assert plan.count("documents.parquet") == 1, plan
    assert "CartesianProduct" not in plan, plan
    # shard slice pushed into the scan's data filters
    assert "* 10)" in plan.split("documents.parquet")[0][-2000:] or (
        "* 10)" in plan
    ), plan
