"""Stateful streaming velocity features via applyInPandasWithState
(SURVEY §2.6-T7 — the custom stateful operator class the reference lacks).

Per account (user_id), maintain a rolling event-time buffer and emit, for
every event, how many events / how much value the account produced in the
trailing 10 minutes. This is the streaming twin of
operators/fraud.fraud_velocity_alert (the batch RANGE-frame formulation,
which is the oracle); the unit test asserts the two agree on a replay.

Scale posture: state is keyed by user_id (naturally fine-grained, no hot
key), each key's buffer is pruned to the 10-minute horizon on every
invocation, and the state store does the rest (RocksDB provider at scale).
"""

from __future__ import annotations

import tempfile
import uuid
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .sources import events_file_stream

WINDOW_US = 600 * 1_000_000  # 10 minutes in epoch-micros

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("n_prior_10m", T.LongType()),
        T.StructField("sum_prior_10m", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("values", T.ArrayType(T.DoubleType())),
    ]
)


def _velocity_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user stateful pass: events arrive in micro-batch order; the state
    holds the (ts, value) buffer from previous batches, pruned to the
    window horizon.

    Vectorized: the trailing-window count/sum per event is searchsorted
    over the (buffer ++ batch) timestamp array plus prefix-sum
    differences — O(n log n) per batch in numpy instead of a per-event
    Python loop with O(window) list pops (the loop form measured ~1.3k
    events/s; this form is bounded by Arrow transfer). The window
    semantics are unchanged: prior events with ts >= event_ts - 10min,
    self excluded. The float sum is a cumsum difference rather than a
    left-to-right re-sum of the live buffer — a different-but-equally-
    valid IEEE summation order; the emitted sum is consumed through
    ROUND(.., 2) on both engines, which already absorbs order noise."""
    import numpy as np

    if state.exists:
        buf_ts, buf_val = state.get
    else:
        buf_ts, buf_val = [], []
    user_id = key[0]
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        pdf = pdf.sort_values(["ts_us", "event_id"])
        ts = np.concatenate(
            [np.asarray(buf_ts, dtype=np.int64), pdf["ts_us"].to_numpy(np.int64)]
        )
        val = np.concatenate(
            [np.asarray(buf_val, dtype=np.float64), pdf["value"].to_numpy(np.float64)]
        )
        b = len(buf_ts)
        k = np.arange(b, len(ts))
        idx = np.searchsorted(ts, ts[k] - WINDOW_US, side="left")
        cs = np.concatenate([[0.0], np.cumsum(val)])
        yield pd.DataFrame(
            {
                "user_id": np.full(len(k), user_id, dtype=np.int64),
                "event_id": pdf["event_id"].to_numpy(np.int64),
                "ts_us": ts[k],
                "n_prior_10m": k - idx,
                "sum_prior_10m": cs[k] - cs[idx],
            }
        )
        keep = ts >= ts[-1] - WINDOW_US
        buf_ts, buf_val = ts[keep].tolist(), val[keep].tolist()
    state.update((buf_ts, buf_val))


def velocity_features_stream(events: DataFrame) -> DataFrame:
    """Attach the stateful velocity operator to an events stream (needs
    event_id/ts/user_id/value columns)."""
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value", "ts"
    ).withWatermark("ts", "1 hour")
    return prepared.groupBy("user_id").applyInPandasWithState(
        _velocity_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_velocity_hermetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the events parquet through the stateful operator to
    completion (availableNow, memory sink)."""
    stream = events_file_stream(spark, sf_dir)
    feats = velocity_features_stream(stream)
    name = "vel_" + uuid.uuid4().hex[:8]
    q = (
        feats.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
