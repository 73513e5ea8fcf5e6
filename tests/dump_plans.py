"""Dump .explain('formatted') for named registry queries to plans/<tag>/.

Usage: python tests/dump_plans.py <tag> <suffix> [query ...]
Writes plans/<tag>/<query>_<suffix>.txt for each query (suffix = before|after).
With no query names, dumps every registered non-diagnostic query.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    out_dir = Path(__file__).resolve().parent.parent / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)

    from real_time_fraud_detection_system_using_big_data_analytics_spark import get_session
    from real_time_fraud_detection_system_using_big_data_analytics_spark.plans import registry
    from real_time_fraud_detection_system_using_big_data_analytics_spark.plans.explain import (
        plan_string,
    )

    registry.load_all()
    if not names:
        names = sorted(n for n in registry.QUERIES if n not in registry.DIAGNOSTIC)

    spark = get_session("dump-plans")
    sf_dir = "/root/testdata/sf0.1"
    for name in names:
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            plan = plan_string(df, mode="formatted")
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR building plan: {exc!r}\n"
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"PLAN {name} -> {name}_{suffix}.txt ({len(plan)} chars)", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
