"""transformWithStateInPandas exhibit (streaming/account_state.py).

The operator needs the protobuf package for Spark's Python state-server
protocol; this sandbox ships without it, so the functional test skips and
a structural test pins the processor contract (state registered in init,
cumulative output) that would silently rot otherwise.
"""

from __future__ import annotations

import pytest

from real_time_fraud_detection_system_using_big_data_analytics_spark.streaming.stateful_queries import (
    _stream_account_profile_tws,
    _tws_available,
)


@pytest.mark.skipif(not _tws_available(), reason="protobuf not installed")
def test_tws_profile_matches_batch_groupby(spark):
    from pyspark.sql import functions as F

    from real_time_fraud_detection_system_using_big_data_analytics_spark.sources.tables import (
        load_tables,
    )

    sf = "/root/testdata/sf0.001"
    got = {r["user_id"]: r for r in _stream_account_profile_tws(spark, sf).collect()}
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


def test_tws_processor_contract():
    """Processor shape: ValueState registered under the documented name,
    handleInputRows yields one cumulative row per key. (Runs without a
    streaming query — pure unit check of the class.)"""
    import pandas as pd

    from real_time_fraud_detection_system_using_big_data_analytics_spark.streaming.account_state import (
        AccountProfileProcessor,
    )

    class FakeState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def __init__(self):
            self.registered = {}

        def getValueState(self, name, schema, ttlDurationMs=None):
            st = FakeState()
            self.registered[name] = st
            return st

    p = AccountProfileProcessor()
    h = FakeHandle()
    p.init(h)
    assert "profile" in h.registered

    batch1 = pd.DataFrame({"value": [1.0, 2.0, 3.0]})
    (out1,) = list(p.handleInputRows((7,), iter([batch1]), None))
    assert out1["n_events"].iloc[0] == 3
    assert out1["total_value_cents"].iloc[0] == 600
    assert out1["max_value_cents"].iloc[0] == 300

    batch2 = pd.DataFrame({"value": [10.0]})
    (out2,) = list(p.handleInputRows((7,), iter([batch2]), None))
    assert out2["n_events"].iloc[0] == 4
    assert out2["total_value_cents"].iloc[0] == 1600
    assert out2["max_value_cents"].iloc[0] == 1000
