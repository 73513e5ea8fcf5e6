"""Split a registered query's wall into BUILD (registry call — includes any
eager actions: iterative loops, k-means fits, bloom collects) vs EXEC (noop
sink write of the returned DataFrame), min-of-N each.

Usage: python tests/profile_query.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    args = sys.argv[1:]
    if args and "/" in args[0]:
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args

    from real_time_fraud_detection_system_using_big_data_analytics_spark import get_session
    from real_time_fraud_detection_system_using_big_data_analytics_spark.plans import registry

    registry.load_all()
    spark = get_session("profile-query")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for name in names:
        fn = registry.QUERIES[name]
        builds, execs = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        print(
            f"PROFILE {name}: build={min(builds):.3f}s exec={min(execs):.3f}s "
            f"(build samples {[round(b, 3) for b in builds]}, "
            f"exec samples {[round(e, 3) for e in execs]})",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
