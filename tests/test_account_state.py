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


def test_state_schema_widening_fails_loud(spark, tmp_path):
    """Ops footgun guard (r9, invited by the statestore read-back surface):
    restarting a stateful query from an existing checkpoint with a WIDENED
    state schema must fail LOUDLY at query start — Spark's state schema
    check must reject the checkpoint, not silently decode old state rows
    into the new layout. If this ever starts passing silently, the
    documented migration path (new checkpoint + backfill replay,
    streaming/statestore.py docstring) is being bypassed."""
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    from real_time_fraud_detection_system_using_big_data_analytics_spark.streaming.account_state import (
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        _profile_fn,
    )

    indir = str(tmp_path / "in")
    outdir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id bigint, value double"
    spark.createDataFrame([(1, 10.0), (2, 5.0)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(indir)

    def run(state_schema, fn):
        stream = spark.readStream.schema(schema).parquet(indir)
        profiles = stream.groupBy("user_id").applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        q = (
            profiles.writeStream.outputMode("append")
            .format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run(STATE_SCHEMA, _profile_fn)  # seed the checkpoint with 3-field state

    widened = T.StructType(
        list(STATE_SCHEMA.fields) + [T.StructField("extra", T.LongType())]
    )

    def widened_fn(key, pdfs, state):
        n, total, mx, extra = (
            state.get if state.exists else (0, 0, -(1 << 62), 0)
        )
        for pdf in pdfs:
            n += len(pdf)
        state.update((n, total, mx, extra))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value_cents": [total],
                "max_value_cents": [mx],
            }
        )

    spark.createDataFrame([(1, 1.0)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(indir)
    with pytest.raises(Exception) as exc_info:
        run(widened, widened_fn)
    msg = str(exc_info.value)
    assert "state" in msg.lower() and "schema" in msg.lower(), msg
