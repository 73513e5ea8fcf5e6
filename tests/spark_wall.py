"""Spark-ONLY per-query walls for the FULL registry at sf0.1 vs true sf1.

The r11 verdict's top remaining gap: the oracle-gate artifacts
(ORACLE_SF01/ORACLE_SF1) time Spark + DuckDB + the Arrow compare in one
`sec`, so there was "no clean Spark-side scale number for most of the
registry" — and the r12 engine split proved the distinction matters
(graph_k_core_peel's 24.6x conflated ratio was 121x DuckDB / 1.7x Spark).
This harness closes that gap: every registered query runs through the
noop sink (plan executed, zero sink cost, no oracle, no compare) at BOTH
real scale factors, interleaved min-of-N per point so one host-stall
burst cannot poison a query's ratio. COLD-PLAN convention: the Spark
cache is cleared before every timed sample (CacheManager matches
persisted data by analyzed plan, so a prior sample's persist() would
otherwise serve the next one and hide the build cost that dominates at
scale); JVM codegen and parquet footer caches stay warm via the
per-SF warmup pass. This differs from bench.py/scale_slope.py, which
measure warm-cache min — both conventions are valid, for different
questions; this artifact answers the 10x-data one.

Registry-tagged DIAGNOSTIC queries are measured at sf0.1 only and
recorded as skipped at sf1 (same protocol as the oracle gate — they are
quadratic by construction; their twins carry the scale claim).

The companion test (tests/test_scale_wall_gate.py::
test_sf1_spark_wall_ratios_attributed) applies the same 15x-at-10x-data
bound to THESE ratios — a cleaner signal than the conflated gate, since
an oracle-side regression (e.g. a DuckDB CTE re-evaluation) can no longer
masquerade as an engine problem.

Usage:  python tests/spark_wall.py [out_json] [sf01_dir] [sf1_dir] [runs]
Defaults: SPARKWALL.json /root/testdata/sf0.1 /tmp/testdata_sf1 2.
SPARK_GRAFT_SPARKWALL_QUERIES="a,b" re-measures a subset and merges into
the existing artifact (the oracle-selfcheck merge protocol; this script
is the artifact's only writer).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    out_path = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("SPARKWALL.json")
    sf01_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    sf1_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/testdata_sf1"
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    from real_time_fraud_detection_system_using_big_data_analytics_spark import (
        get_session,
    )
    from real_time_fraud_detection_system_using_big_data_analytics_spark.plans import (
        registry,
    )

    registry.load_all()
    spark = get_session("spark-wall")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    subset_env = os.environ.get("SPARK_GRAFT_SPARKWALL_QUERIES")
    subset = (
        sorted(
            s.strip()
            for s in subset_env.split(",")
            if s.strip() in registry.QUERIES
        )
        if subset_env
        else None
    )
    names = subset if subset else sorted(registry.QUERIES)

    results: dict[str, dict] = {}
    if subset and out_path.exists():
        results = json.loads(out_path.read_text())["queries"]

    def run_once(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    t_start = time.time()
    # per-SF passes: warmup once, then `runs` interleaved rounds so a
    # bursty host stall lands on different queries in different rounds
    walls: dict[str, dict[str, list[float]]] = {n: {"sf01": [], "sf1": []} for n in names}
    for sf_key, sf_dir in (("sf01", sf01_dir), ("sf1", sf1_dir)):
        active = [
            n for n in names
            if not (sf_key == "sf1" and n in registry.DIAGNOSTIC)
        ]
        for n in active:  # warmup: parquet footers + codegen
            try:
                run_once(n, sf_dir)
            except Exception:
                pass
        for _ in range(runs):
            for n in list(active):
                # cold-plan convention: Spark's CacheManager matches
                # persisted data by analyzed plan, so a prior run's
                # persist() would silently serve the next run (k-core
                # measured 0.9 s warm vs 1.7 s with its edge build — the
                # build IS the scale-relevant cost). Cleared per sample;
                # JVM codegen and OS page cache stay warm, which is what
                # the warmup pass is for.
                spark.catalog.clearCache()
                try:
                    walls[n][sf_key].append(run_once(n, sf_dir))
                except Exception as exc:
                    # record the failure and keep sweeping — the r12 form
                    # `break`-ed here, which silently zeroed the samples
                    # of every query AFTER the failed one in sort order
                    # (ADVICE r12); dropping only the failed query keeps
                    # the round's coverage intact
                    walls[n][sf_key] = []
                    results[n] = {"err": f"{type(exc).__name__}: {exc}"[:300]}
                    active.remove(n)
        spark.catalog.clearCache()
        print(f"SPARKWALL pass {sf_key} done ({len(active)} queries)", flush=True)

    for n in names:
        if n in results and results[n].get("err"):
            continue
        w01 = walls[n]["sf01"]
        w1 = walls[n]["sf1"]
        rec: dict = {"err": None}
        if w01:
            rec["sf01"] = round(min(w01), 3)
        if n in registry.DIAGNOSTIC:
            rec["sf1"] = None
            rec["skipped_sf1"] = "diagnostic (quadratic A/B baseline)"
        elif w1:
            rec["sf1"] = round(min(w1), 3)
            if w01 and rec["sf01"] > 0:
                rec["ratio"] = round(rec["sf1"] / rec["sf01"], 2)
        results[n] = rec

    measured = [r for r in results.values() if r.get("ratio") is not None]
    ratios = sorted(r["ratio"] for r in measured)
    summary = {
        "sf01_dir": sf01_dir,
        "sf1_dir": sf1_dir,
        "runs_per_point": runs,
        "n_queries": len(results),
        "n_ratio_measured": len(measured),
        "n_err": sum(1 for r in results.values() if r.get("err")),
        "n_skipped_sf1_diagnostic": sum(
            1 for r in results.values() if r.get("skipped_sf1")
        ),
        "ratio_median": ratios[len(ratios) // 2] if ratios else None,
        "ratio_max": ratios[-1] if ratios else None,
        "total_sec": round(time.time() - t_start, 1),
        "merged_rerun": subset,
    }
    out_path.write_text(
        json.dumps({"summary": summary, "queries": results}, indent=1, sort_keys=True)
        + "\n"
    )
    print("SPARKWALL SUMMARY " + json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
