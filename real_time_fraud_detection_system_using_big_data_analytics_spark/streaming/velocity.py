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
from pyspark.sql import functions as F
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
        T.StructField("sum_prior_cents", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("cents", T.ArrayType(T.LongType())),
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
    self excluded. Values are quantized to int64 CENTS per row before
    the cumsum (same rule as the join-windowed twin and account_state),
    so the prefix-sum difference is exact integer arithmetic — no IEEE
    summation-order dependence at all, and both velocity twins share one
    integer-cents oracle verbatim (r7 verdict task 6)."""
    import numpy as np

    if state.exists:
        buf_ts, buf_cents = state.get
    else:
        buf_ts, buf_cents = [], []
    user_id = key[0]
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        pdf = pdf.sort_values(["ts_us", "event_id"])
        ts = np.concatenate(
            [np.asarray(buf_ts, dtype=np.int64), pdf["ts_us"].to_numpy(np.int64)]
        )
        # floor(x*100 + 0.5) = round-half-up toward +inf; assumes value
        # is non-negative (it is: events.value is a transaction amount).
        # See velocity_features_join_stream for the matching JVM-side form.
        cents = np.concatenate(
            [
                np.asarray(buf_cents, dtype=np.int64),
                np.floor(pdf["value"].to_numpy(np.float64) * 100 + 0.5).astype(
                    np.int64
                ),
            ]
        )
        b = len(buf_ts)
        k = np.arange(b, len(ts))
        idx = np.searchsorted(ts, ts[k] - WINDOW_US, side="left")
        cs = np.concatenate([[0], np.cumsum(cents)])
        yield pd.DataFrame(
            {
                "user_id": np.full(len(k), user_id, dtype=np.int64),
                "event_id": pdf["event_id"].to_numpy(np.int64),
                "ts_us": ts[k],
                "n_prior_10m": k - idx,
                "sum_prior_cents": cs[k] - cs[idx],
            }
        )
        keep = ts >= ts[-1] - WINDOW_US
        buf_ts, buf_cents = ts[keep].tolist(), cents[keep].tolist()
    state.update((buf_ts, buf_cents))


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


def velocity_features_join_stream(stream: DataFrame) -> DataFrame:
    """The JVM-state formulation of the SAME trailing-10-minute velocity
    semantics: a watermarked stream-stream self-join on a bounded
    event-time interval (each event picks up its own user's events in
    [ts - 10 min, ts]) chained into a windowed append-mode aggregation
    keyed by the event — both stages keep their state in the JVM state
    store, no Python worker in the loop.

    Why this exists: r5 task 2 asked whether the applyInPandasWithState
    velocity's ~12.7k events/s bench line is a Python-protocol floor. The
    committed A/B profile (BENCH_NOTES_r6.md) says mostly no: the floor
    is ~0.9 s/micro-batch of engine-side stateful machinery that a pure-
    JVM windowed agg pays too (~0.75 s/batch), and that this THREE-
    stateful-store chain pays three times over — so at the bench's 12.5k-
    event micro-batches this form is ~4× SLOWER than the pandas form,
    while a single-batch replay of the pandas form runs 65k events/s.
    Throughput is batch-size-bound, not protocol-bound. This query stays
    registered as the value-pinned JVM twin (same oracle) and as the
    honest record of that trade: it wins only where Arrow transfer of
    every event dominates — very large batches over narrow state — and
    per-key Python state remains the right tool for genuine recurrences
    (CUSUM, Holt-Winters) that relational streaming cannot express.

    State bounds: join state is each side's 1-hour watermark horizon
    (the interval condition lets Spark expire rows); agg state is one row
    per in-flight event, evicted when the watermark passes its 10-minute
    window. Both stores are keyed by user/event — fine-grained, RocksDB-
    backed at scale. Fan-out equals sum of per-event trailing-window
    sizes (~1.01× at sf0.1 — events per user are sparse).

    Each event joins AT LEAST itself (r.ts <= l.ts includes the row
    itself), so n_prior = count - 1 and sum_prior = sum - own value; an
    event with an empty trailing window still emits exactly one row."""
    # Quantize value to int64 cents per row BEFORE any aggregation: the
    # join fan-out feeds a shuffled SUM whose float summation order is
    # nondeterministic, while the oracle sums in frame order — integer
    # cents make the two order-free-equal (same rule as account_state).
    # floor(x*100 + 0.5) is round-half-up toward +inf, which differs from
    # ROUND for NEGATIVE inputs — safe only because events.value is a
    # non-negative transaction amount; a sign-carrying column would need
    # a sign-symmetric quantizer to stay consistent with ROUND elsewhere.
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    base = stream.select("event_id", "ts", "user_id", cents.alias("cents"))
    left = base.select(
        "event_id",
        "user_id",
        F.col("ts").alias("l_ts"),
        F.col("cents").alias("l_cents"),
    ).withWatermark("l_ts", "1 hour")
    right = base.select(
        F.col("user_id").alias("r_user"),
        F.col("ts").alias("r_ts"),
        F.col("cents").alias("r_cents"),
    ).withWatermark("r_ts", "1 hour")
    joined = left.join(
        right,
        (F.col("r_user") == F.col("user_id"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("r_ts") <= F.col("l_ts")),
    )
    # group on unix_micros(l_ts), not l_ts itself: the raw column carries
    # the event-time watermark tag, and an aggregation output may hold at
    # most ONE event-time column (the window) — the bigint copy is inert
    agg = joined.groupBy(
        F.window("l_ts", "10 minutes"),
        "event_id",
        "user_id",
        F.unix_micros("l_ts").alias("ts_us"),
        "l_cents",
    ).agg(F.count(F.lit(1)).alias("n_incl"), F.sum("r_cents").alias("sum_incl"))
    return agg.select(
        "user_id",
        "event_id",
        "ts_us",
        (F.col("n_incl") - 1).cast("long").alias("n_prior_10m"),
        (F.col("sum_incl") - F.col("l_cents")).cast("long").alias("sum_prior_cents"),
    )


def run_velocity_join_hermetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay events through the JVM join+window velocity to completion.
    Two sentinel batches flush the append-mode tail (availableNow runs no
    no-data batches; the sentinel idiom is documented at
    pipeline.stream_stream_left_outer_join); sentinel rows (user_id = -1)
    only ever join themselves and are dropped AFTER the replay — a filter
    inside the stream would be pushed below withWatermark and freeze the
    clock."""
    import shutil

    from .replay import chunked_replay, spool_event_chunks

    spool = spool_event_chunks(spark, sf_dir, n_chunks=3, sentinel_chunks=2)
    result, _ = chunked_replay(
        spark, sf_dir, velocity_features_join_stream, spool=spool
    )
    shutil.rmtree(spool, ignore_errors=True)
    return result.where(F.col("user_id") >= 0)


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
