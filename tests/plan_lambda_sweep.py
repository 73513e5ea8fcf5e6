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
Since r11 the cross-check against the measured artifacts is AUTOMATED:
`classify_hits` joins every hit against BENCH_SELF.json walls and
SCALING.json slopes and splits them into in-band (cheap and linear, or
registry-tagged diagnostic baselines) vs out-of-band (expensive,
supralinear, or unbenched) — tests/test_plan_sweep.py fails only on the
out-of-band set, which is exactly the check that would have caught the
r10 overlap-decontamination tax (18.7 s >> the 5 s wall band).

Usage: python tests/plan_lambda_sweep.py [sf_dir]   (construct-only; no jobs run)
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent

# families whose construction executes work or needs services; the sweep is
# about declarative batch plans (same exclusion rationale as test_plans.py)
SKIP_PREFIXES = (
    "stream_", "ml_", "source_", "multimodal_", "sql_scripting", "etl_",
)

# in-band limits: a lambda-filter lead is actionable only when the query is
# measurably expensive (wall at sf0.1 above the band every healthy headline
# query sits in) or measurably supralinear (slope-twin ratio at 5x data).
# Queries outside bench.py's curated headline set are banded by the
# FULL-registry self-oracle wall instead (ORACLE_SF01: Spark + DuckDB
# combined, hence the looser bound — the r10 overlap tax at 18.7 s
# Spark-side alone would still trip it).
WALL_BOUND_SEC = 5.0
ORACLE_WALL_BOUND_SEC = 12.0
# slope5 reads ~5 at 5x data for a genuinely LINEAR query (SCALING.md);
# the bound must sit above that or a healthy linear lambda-filter query
# gets classified out-of-band (r12 ADVICE — the old 4.0 only worked
# because every twin read under it on fixed-overhead dominance). 7.0
# leaves linear+noise in-band while still catching the quadratics
# (13.9-26.5 at 5x).
SLOPE_BOUND = 7.0

# a line that STARTS a new plan node: optional tree-drawing prefix
# (": ", "|  ", spaces) then a branch marker "+- " / ":- ", or the
# unprefixed root node on the first line. Lines not matching are treated
# as continuations of the previous node (wrapped conditions).
_NODE_LINE = re.compile(r"^[\s:|]*(?:\+- |:- )")


def filter_node_texts(plan: str) -> list[str]:
    """Full text of every Filter node in a plan string, continuation lines
    included — a condition that wraps across lines can no longer hide a
    lambdafunction from the detector (ADVICE r10: the old single-line
    regex only saw the first line of each node)."""
    nodes: list[list[str]] = []
    for i, line in enumerate(plan.splitlines()):
        if i == 0 or _NODE_LINE.match(line):
            nodes.append([line])
        elif nodes:
            nodes[-1].append(line)
    out = []
    for chunk in nodes:
        head = chunk[0]
        if re.match(r"^[\s:|]*(?:\+- |:- )?Filter[ (]", head):
            out.append("\n".join(chunk))
    return out


def sweep(spark, queries: dict, sf_dir: str) -> tuple[list[tuple[str, int]], list[str]]:
    """Construct every eligible query's optimized plan and count Filter
    nodes embedding a higher-order lambda. Returns (hits, errors)."""
    hits: list[tuple[str, int]] = []
    errors: list[str] = []
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
            errors.append(f"{name}: {str(exc)[:100]}")
            continue
        n = sum(
            1
            for node in filter_node_texts(plan)
            if "lambdafunction" in node
            and any(f in node for f in ("transform(", "aggregate(", "filter("))
        )
        if n:
            hits.append((name, n))
    return hits, errors


def classify_hits(
    hits: list[tuple[str, int]],
    bench_queries: dict[str, float],
    scaling: dict[str, dict[str, float]],
    diagnostic: set[str],
    oracle_walls: dict[str, float] | None = None,
) -> tuple[list[str], list[str]]:
    """Split sweep hits into (in_band, out_of_band) against the committed
    artifacts. A hit is in-band when it is a registry-tagged diagnostic
    baseline, or when its measured wall is under the band (BENCH_SELF
    wall < WALL_BOUND_SEC for headline queries; ORACLE_SF01 combined wall
    < ORACLE_WALL_BOUND_SEC for the rest of the registry) and its slope
    twin (when one exists) is under SLOPE_BOUND. Hits with NO measured
    artifact at all are out-of-band by design — a new lambda-filter query
    must enter a measured harness before the lead can be dismissed."""
    in_band: list[str] = []
    out_of_band: list[str] = []
    oracle_walls = oracle_walls or {}
    for name, n in hits:
        if name in diagnostic:
            in_band.append(f"{name} ({n} filters; diagnostic baseline)")
            continue
        wall = bench_queries.get(name)
        owall = oracle_walls.get(name)
        pts = scaling.get(name) or {}
        slope = (pts["5"] / pts["1"]) if ("5" in pts and "1" in pts and pts["1"]) else None
        if slope is not None and slope > SLOPE_BOUND:
            out_of_band.append(f"{name} ({n} filters; slope5 {slope:.2f} > {SLOPE_BOUND})")
        elif wall is not None:
            if wall > WALL_BOUND_SEC:
                out_of_band.append(
                    f"{name} ({n} filters; wall {wall:.2f}s > {WALL_BOUND_SEC}s)"
                )
            else:
                tag = f"wall {wall:.2f}s" + (f", slope5 {slope:.2f}" if slope else "")
                in_band.append(f"{name} ({n} filters; {tag})")
        elif owall is not None:
            if owall > ORACLE_WALL_BOUND_SEC:
                out_of_band.append(
                    f"{name} ({n} filters; oracle wall {owall:.2f}s "
                    f"> {ORACLE_WALL_BOUND_SEC}s)"
                )
            else:
                in_band.append(f"{name} ({n} filters; oracle wall {owall:.2f}s)")
        else:
            out_of_band.append(f"{name} ({n} filters; UNMEASURED — bench or gate it)")
    return in_band, out_of_band


def load_artifacts() -> tuple[dict[str, float], dict[str, dict[str, float]], dict[str, float]]:
    bench = json.loads((REPO / "BENCH_SELF.json").read_text())
    scaling = json.loads((REPO / "SCALING.json").read_text())
    oracle_walls: dict[str, float] = {}
    latest, latest_round = None, -1
    for cand in REPO.glob("ORACLE_SF01_r*.json"):
        m = re.search(r"_r(\d+)\.json$", cand.name)
        rnd = int(m.group(1)) if m else -1
        if rnd > latest_round:
            latest, latest_round = cand, rnd
    if latest is not None:
        data = json.loads(latest.read_text())
        oracle_walls = {
            k: v["sec"] for k, v in data.get("queries", {}).items() if "sec" in v
        }
    return bench.get("queries", {}), scaling, oracle_walls


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry
    from real_time_fraud_detection_system_using_big_data_analytics_spark import get_session
    from real_time_fraud_detection_system_using_big_data_analytics_spark.plans import registry

    spark = get_session("plan-lambda-sweep")
    queries = entry.queries()
    hits, errors = sweep(spark, queries, sf_dir)
    for e in errors:
        print("ERR", e)
    bench_q, scaling, oracle_walls = load_artifacts()
    in_band, out_of_band = classify_hits(
        hits, bench_q, scaling, registry.DIAGNOSTIC, oracle_walls
    )
    for line in in_band:
        print("LAMBDA-FILTER in-band:", line)
    for line in out_of_band:
        print("LAMBDA-FILTER OUT-OF-BAND:", line)
    print(
        f"swept {len(queries)} queries, {len(hits)} leads "
        f"({len(in_band)} in-band, {len(out_of_band)} out-of-band)"
    )
    spark.stop()
    return 1 if out_of_band else 0


if __name__ == "__main__":
    raise SystemExit(main())
