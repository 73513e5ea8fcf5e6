"""Diagnostic sweep: flag registered queries whose OPTIMIZED plan contains a
Filter condition embedding a higher-order lambda (transform/aggregate/filter
over an array) — the signature of the rules-move-work failure class
documented in SURVEY 4.5:

- CollapseProject can inline an expensive array expression into every
  downstream reference (r9, operators/dedup.py:61);
- InferFiltersFromGenerate + predicate pushdown can carry a synthesized
  `size(arr) > 0` below a fan-out exchange into a single-task scan stage,
  re-evaluating the whole nested transform per row on one core (r10,
  curation_decontaminate_overlap — 18.7 s for a 1.1 s job before the
  explode_outer rewrite).

A hit is a LEAD, not a verdict: the lambda-filter is only a problem when
the stage it lands in is low-parallelism AND the expression is expensive.
Cross-check every hit against BENCH_SELF.json minutes and SCALING.md
slopes before acting (r10 sweep: 13 queries flagged, all in-band — the
iterative CC cascade repeats its shingle expression by construction and
measures linear).

Usage: python tests/plan_lambda_sweep.py [sf_dir]   (construct-only; no jobs run)
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# families whose construction executes work or needs services; the sweep is
# about declarative batch plans (same exclusion rationale as test_plans.py)
SKIP_PREFIXES = (
    "stream_", "ml_", "source_", "multimodal_", "sql_scripting", "etl_",
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry
    from real_time_fraud_detection_system_using_big_data_analytics_spark import get_session

    spark = get_session("plan-lambda-sweep")
    queries = entry.queries()
    hits = []
    for name in sorted(queries):
        if name.startswith(SKIP_PREFIXES):
            continue
        try:
            plan = (
                queries[name](spark, sf_dir)
                ._jdf.queryExecution()
                .optimizedPlan()
                .toString()
            )
        except Exception as exc:  # pragma: no cover - diagnostic tool
            print("ERR", name, str(exc)[:100])
            continue
        n = sum(
            1
            for m in re.finditer(r"Filter \(?(.*)", plan)
            if "lambdafunction" in m.group(1)
            and any(f in m.group(1) for f in ("transform(", "aggregate(", "filter("))
        )
        if n:
            hits.append((name, n))
    for name, n in hits:
        print(f"LAMBDA-FILTER {name} {n}")
    print(f"swept {len(queries)} queries, {len(hits)} leads")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
