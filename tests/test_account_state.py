"""Stateful account-profile operator (streaming/account_state.py).

Round 6 replaced the protobuf-gated transformWithStateInPandas exhibit with
an applyInPandasWithState implementation of the same semantics — these
tests now EXECUTE the replay (no environment skip) and pin both the
end-to-end stream==batch equality and the per-batch fold contract.
"""

from __future__ import annotations

import pandas as pd
import pytest


def test_account_profile_matches_batch_groupby(spark):
    """availableNow replay's final keyed state == batch GROUP BY, exact
    integer equality on the cents-quantized totals."""
    from pyspark.sql import functions as F

    from real_time_fraud_detection_system_using_big_data_analytics_spark.sources.tables import (
        load_tables,
    )
    from real_time_fraud_detection_system_using_big_data_analytics_spark.streaming.stateful_queries import (
        stream_account_profile,
    )

    sf = "/root/testdata/sf0.001"
    got = {r["user_id"]: r for r in stream_account_profile(spark, sf).collect()}
    ev = load_tables(spark, sf, names=("events",))["events"]
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    want = {
        r["user_id"]: r
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents).alias("total_value_cents"),
            F.max(cents).alias("max_value_cents"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for uid, row in want.items():
        assert got[uid]["n_events"] == row["n_events"]
        # exact integer equality — cents are quantized per-row pre-sum
        assert got[uid]["total_value_cents"] == row["total_value_cents"]
        assert got[uid]["max_value_cents"] == row["max_value_cents"]


def test_profile_fold_contract():
    """Per-batch fold: cumulative (count, sum cents, max cents) across
    successive invocations with carried state. Pure unit check — no
    streaming query."""
    from real_time_fraud_detection_system_using_big_data_analytics_spark.streaming.account_state import (
        _profile_fn,
    )

    class FakeState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    st = FakeState()
    batch1 = pd.DataFrame({"value": [1.0, 2.0, 3.0]})
    (out1,) = list(_profile_fn((7,), iter([batch1]), st))
    assert out1["n_events"].iloc[0] == 3
    assert out1["total_value_cents"].iloc[0] == 600
    assert out1["max_value_cents"].iloc[0] == 300
    assert st.get == (3, 600, 300)

    batch2 = pd.DataFrame({"value": [10.0]})
    (out2,) = list(_profile_fn((7,), iter([batch2]), st))
    assert out2["n_events"].iloc[0] == 4
    assert out2["total_value_cents"].iloc[0] == 1600
    assert out2["max_value_cents"].iloc[0] == 1000
