"""Per-account lifetime profile via transformWithStateInPandas — Spark 4's
arbitrary-state API (successor to applyInPandasWithState, SURVEY §2.6-T7).

Maintains, per user, a ValueState with (event count, value sum, max value)
that survives across micro-batches and restarts (checkpointed with the
query). Each batch emits the UPDATED cumulative profile for every user seen
in that batch — exactly a streaming materialized view of

    SELECT user_id, COUNT(*), SUM(value), MAX(value) FROM events GROUP BY 1

kept incrementally, which is what makes it DuckDB-oracle-checkable on an
availableNow replay.

Value totals are accumulated as BIGINT *cents*: each value is quantized
per-row with FLOOR(v*100 + 0.5) — the same IEEE double ops numpy and
DuckDB both execute — BEFORE summation, so the running total is exact
integer arithmetic and cannot depend on batch arrival order. A double
accumulator here would sum in Python batch order while the oracle sums in
DuckDB's scan order; the strict value-hash comparison would then flake on
last-bit drift. Same cents trick as operators/cdc.py.

Why both APIs exist in this repo: applyInPandasWithState (velocity.py) is
the stable per-group-buffer form; transformWithState adds composable typed
state (value/list/map), timers, and TTL — the API a new stateful operator
should target. The plumbing differences (handle-based state registration in
``init``, per-key ``handleInputRows``) are exactly what this exhibit pins.

Scale posture: state is one small fixed-width row per user (no per-event
buffer), keyed on user_id — fine-grained, bounded, RocksDB-backed at scale;
TTL (state_ttl) is the retention knob for inactive accounts.
"""

from __future__ import annotations

import tempfile
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from .sources import events_file_stream

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value_cents", T.LongType()),
        T.StructField("max_value_cents", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total_cents", T.LongType()),
        T.StructField("mx_cents", T.LongType()),
    ]
)


def _to_cents(values: pd.Series) -> "pd.Series":
    """FLOOR(v*100 + 0.5) as int64 — the q()/q_sql quantizer, per row."""
    import numpy as np

    return np.floor(values.to_numpy(dtype="float64") * 100.0 + 0.5).astype("int64")


class AccountProfileProcessor(StatefulProcessor):
    """ValueState-backed running (count, sum cents, max cents) per account."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._profile = handle.getValueState("profile", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, total, mx = 0, 0, -(1 << 62)
        if self._profile.exists():
            n, total, mx = self._profile.get()
        for pdf in rows:
            cents = _to_cents(pdf["value"])
            n += len(pdf)
            total += int(cents.sum())
            mx = max(mx, int(cents.max()))
        self._profile.update((n, total, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value_cents": [total],
                "max_value_cents": [mx],
            }
        )

    def close(self) -> None:
        pass


def account_profile_stream(events: DataFrame) -> DataFrame:
    """Attach the TWS processor to an events stream (user_id/value cols)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=AccountProfileProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def run_account_profile_hermetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the events parquet through the processor to completion."""
    stream = events_file_stream(spark, sf_dir)
    profiles = account_profile_stream(stream)
    name = "acct_" + uuid.uuid4().hex[:8]
    q = (
        profiles.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_tws_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode sink may hold one row per key per batch: keep the final
    # (cumulative) row per user — on a single-batch availableNow replay this
    # is a no-op, on a chunked replay it is the correct "latest state" read.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    sink = spark.table(name)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        sink.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
