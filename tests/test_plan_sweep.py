"""In-band gate for the lambda-filter plan sweep (r10 verdict task 7).

The sweep flags every registered query whose optimized plan evaluates a
higher-order lambda inside a Filter — the SURVEY 4.5 rules-move-work
failure class. r10 cross-checked the 13 leads against BENCH_SELF /
SCALING by hand; this test automates that join and FAILS only on
out-of-band hits (expensive, supralinear, or unbenched), which is the
check that would have caught the r10 overlap-decontamination tax
(18.7 s wall against a 5 s band) at commit time instead of bench time.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from tests.plan_lambda_sweep import classify_hits, filter_node_texts, load_artifacts, sweep

REPO = Path(__file__).resolve().parent.parent
SF = "/root/testdata/sf0.01"


def test_filter_node_capture_multiline():
    """A condition wrapped across lines must not hide its lambda (the r10
    ADVICE false-negative): the node text includes continuations."""
    plan = (
        "Project [a#1]\n"
        "+- Filter (size(transform(xs#2,\n"
        "      lambdafunction(x, x)), true) > 0)\n"
        "   +- Relation [xs#2]"
    )
    nodes = filter_node_texts(plan)
    assert len(nodes) == 1
    assert "lambdafunction" in nodes[0] and "transform(" in nodes[0]
    # and the single-line form still works
    plan2 = "Filter (aggregate(xs#2, 0, lambdafunction(a, b)) > 1)\n+- Relation [xs#2]"
    assert len(filter_node_texts(plan2)) == 1


def test_lambda_sweep_hits_are_in_band(spark):
    """Every lambda-filter lead in the registry must be banded by the
    committed artifacts: diagnostic-tagged, or measured cheap (wall) and
    linear (slope twin where one exists)."""
    if not (REPO / "BENCH_SELF.json").exists():
        pytest.skip("no committed BENCH_SELF.json to band against")
    import __spark_entry__ as entry
    from real_time_fraud_detection_system_using_big_data_analytics_spark.plans import registry

    registry.load_all()
    hits, errors = sweep(spark, entry.queries(), SF)
    assert not errors, errors
    bench_q, scaling, oracle_walls = load_artifacts()
    in_band, out_of_band = classify_hits(
        hits, bench_q, scaling, registry.DIAGNOSTIC, oracle_walls
    )
    assert not out_of_band, (
        "lambda-filter leads outside the measured band (cross-check the "
        f"plan, then bench or tag): {out_of_band}"
    )
