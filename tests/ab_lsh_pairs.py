"""A/B harness for dedup_minhash_lsh_pairs at sf0.1 on an IDLE box.

Round-4 bench showed the bucket-expansion formulation at 1.63 s vs 0.82 s
in round 3 — in a round whose drift was otherwise uniform box noise (the
query itself was NOT touched in r4; the expansion dates from round 2).
This script settles it empirically: it times the current registered
implementation against the pre-391b009 self-join formulation
(reconstructed below from git history), interleaved min-of-N, same
noop-sink forcing as bench.py.

Usage: python tests/ab_lsh_pairs.py [sf_dir] [n_rounds]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from real_time_fraud_detection_system_using_big_data_analytics_spark import get_session
from real_time_fraud_detection_system_using_big_data_analytics_spark.functions.scalars import q
from real_time_fraud_detection_system_using_big_data_analytics_spark.operators.dedup import (
    _BANDS,
    N_SEEDS,
    _shingles_spark,
    dedup_minhash_lsh_pairs,
)
from real_time_fraud_detection_system_using_big_data_analytics_spark.sources.tables import (
    load_tables,
)


def lsh_pairs_selfjoin(spark, sf_dir: str):
    """Pre-391b009 formulation: signatures ride along band rows into a
    band-bucket SELF-JOIN (signature pipeline executes twice — Spark does
    not reuse exchanges across a self-join's two branches)."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    sh = _shingles_spark(d)
    sigs = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{s}|"), F.col("shingle")))).alias(f"mh{s}")
            for s in range(N_SEEDS)
        ]
    )
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(F.concat(*[F.col(f"mh{s}") for s in band])).alias("band_hash"),
            )
            for b, band in enumerate(_BANDS)
        ]
    )
    mh_cols = [f"mh{s}" for s in range(N_SEEDS)]
    bands = sigs.select("doc_id", *mh_cols, F.explode(band_arr).alias("bb")).select(
        "doc_id", *mh_cols, "bb.band_id", "bb.band_hash"
    )
    a = bands.alias("a")
    b = bands.alias("b")
    agree = sum(
        F.when(F.col(f"a.mh{s}") == F.col(f"b.mh{s}"), 1).otherwise(0)
        for s in range(N_SEEDS)
    )
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            q(agree / float(N_SEEDS)).alias("est_jaccard"),
        )
        .distinct()
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_session("ab-lsh")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    variants = {
        "bucket_expansion (current)": dedup_minhash_lsh_pairs,
        "self_join (pre-391b009)": lsh_pairs_selfjoin,
    }
    # equality check first: both must produce the same pair set
    rows = {
        name: sorted(map(tuple, fn(spark, sf_dir).collect()))
        for name, fn in variants.items()
    }
    vals = list(rows.values())
    print("AB same-result:", vals[0] == vals[1], f"({len(vals[0])} pairs)")

    samples: dict[str, list[float]] = {name: [] for name in variants}
    for name, fn in variants.items():  # warmup pass each
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    for _ in range(n):
        for name, fn in variants.items():  # interleaved
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
    for name, ts in samples.items():
        print(f"AB {name}: min={min(ts):.3f}s samples={[round(t, 2) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
