"""Core-scaling probe (r14, r13 verdict item 2: `suspect_cpus_ignored`).

The driver's 8-vs-32-core comparison runs the warm sf0.1 bench, where
0.2-0.9 s queries sit at the plan+schedule fixed-cost floor and persisted
subtrees are served from cache — so every ratio reads ≈1 regardless of how
parallel the engine is. This probe measures what that diagnostic wants to
know: COLD-cache walls (clearCache before every sample) at a
compute-dominated scale factor (sf1), at two core counts, in separate
processes (local[n] is fixed per JVM).

Usage:
    python tests/gen_sf.py 10 /tmp/testdata_sf1     # deterministic sf1
    python tests/core_scaling_probe.py /tmp/testdata_sf1 SCALING_r14.json

Writes {"sf_dir", "queries": {name: {"cold_min_c8", "cold_min_c32",
"ratio_c8_over_c32"}}, "summary": {...}} — ratio > 1 means the extra cores
are absorbing real compute. Queries: the bench COMPACT_SET plus the
operator families this round vectorized (their cold walls are the
at-scale evidence).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PROBE_QUERIES = [
    # compact set (the driver's comparison unit)
    "q1_pricing_summary", "agg_grouped_summary", "agg_conditional_single_pass",
    "agg_cube", "scalar_string_date_json", "join_multiway_revenue", "join_asof",
    "window_running_agg", "window_sessionize", "fraud_confusion_matrix",
    "sort_topk_global", "dedup_minhash_lsh_pairs", "dedup_simhash",
    "ann_bruteforce_topk", "ann_int8_rerank", "text_quality_score",
    "text_chunk_windows", "text_top_ngrams", "text_tfidf_top_terms",
    "map_functions_props", "timeseries_gapfill", "unpivot_stack",
    "feature_winsorize", "scd2_intervals", "funnel_conversion",
    "cohort_retention", "cdc_snapshot_diff", "graph_pagerank_bipartite",
    # r14-vectorized / heavy families
    "ann_ivf_kmeans_nprobe2", "ann_recall_at_k", "dedup_sketch_agreement",
    "text_gopher_repetition_signals", "graph_label_propagation",
    "dedup_semdedup", "ann_knn_graph",
]

SAMPLES = 2


def run_one_process(sf_dir: str, cpus: int) -> dict:
    """Child-process body: cold min-of-N walls for every probe query."""
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from real_time_fraud_detection_system_using_big_data_analytics_spark import (
        get_session,
    )
    from real_time_fraud_detection_system_using_big_data_analytics_spark.plans import (
        registry,
    )

    registry.load_all()
    spark = get_session(f"scaling-probe-c{cpus}", cpus=cpus)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    names = [n for n in PROBE_QUERIES if n in registry.QUERIES]
    for n in names:  # warm JVM/codegen once; cache cleared per timed sample
        registry.QUERIES[n](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(SAMPLES):
        for n in names:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            registry.QUERIES[n](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[n].append(time.perf_counter() - t0)
    spark.stop()
    return {n: round(min(ts), 3) for n, ts in samples.items()}


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        sf_dir, cpus = sys.argv[2], int(sys.argv[3])
        print("PROBE_RESULT " + json.dumps(run_one_process(sf_dir, cpus)))
        return 0

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1"
    out_path = Path(sys.argv[2]) if len(sys.argv) > 2 else Path("SCALING_r14.json")
    results: dict[int, dict] = {}
    for cpus in (8, 32):
        proc = subprocess.run(
            [sys.executable, __file__, "--child", sf_dir, str(cpus)],
            capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("PROBE_RESULT ")]
        if not line:
            print(proc.stdout[-2000:], proc.stderr[-2000:])
            raise RuntimeError(f"child cpus={cpus} produced no result")
        results[cpus] = json.loads(line[-1][len("PROBE_RESULT "):])
    common = sorted(set(results[8]) & set(results[32]))
    queries = {
        n: {
            "cold_min_c8": results[8][n],
            "cold_min_c32": results[32][n],
            "ratio_c8_over_c32": round(results[8][n] / results[32][n], 2),
        }
        for n in common
    }
    ratios = [q["ratio_c8_over_c32"] for q in queries.values()]
    out = {
        "sf_dir": sf_dir,
        "cold_samples": SAMPLES,
        "queries": queries,
        "summary": {
            "n_queries": len(common),
            "median_ratio": round(statistics.median(ratios), 2),
            "max_ratio": max(ratios),
            "n_ratio_ge_1_5": sum(r >= 1.5 for r in ratios),
            "total_c8": round(sum(results[8][n] for n in common), 2),
            "total_c32": round(sum(results[32][n] for n in common), 2),
        },
    }
    out_path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out["summary"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
