"""Chunked replay harness (SURVEY §2.1 S10): feed a table through a
streaming query as a SEQUENCE of micro-batches, not one availableNow gulp.

The reference's producer replays a CSV row-at-a-time into Kafka
(transaction_producer.py:93-151) precisely so the streaming app sees many
small batches. A single-batch availableNow replay never exercises what
multi-batch execution exercises: keyed state carried ACROSS batches,
watermark advancement, and per-batch sink semantics. This harness restores
that coverage hermetically:

1. the events table is split into N contiguous event-time chunks (ordered
   by (ts, event_id) so the replay is in-order, like the producer's);
2. each chunk lands in a spool directory as one parquet file with strictly
   increasing modification times;
3. the stream reads the spool with ``maxFilesPerTrigger=1`` — the file
   source admits one file per micro-batch, so chunk boundaries ARE batch
   boundaries.

Test usage: run a stateful operator through ``chunked_replay`` and assert
the result equals the batch formulation — if state is dropped or
double-counted between batches, the comparison fails (a bug class the
one-batch replay can never catch).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def spool_event_chunks(
    spark: SparkSession,
    sf_dir: str,
    n_chunks: int,
    spool_dir: str | None = None,
    sentinel_chunks: int = 0,
) -> str:
    """Split the events table into ``n_chunks`` event-time-ordered parquet
    files under a spool directory; returns the directory path.

    ``sentinel_chunks`` appends that many extra single-row chunk files
    whose one event sits far past the real data's max event time
    (event_type='sentinel', user_id=-1 — joins/filters on real types never
    see it). Two sentinels are the watermark-flush idiom for OUTER
    stateful operators under availableNow: Spark does not run no-data
    micro-batches for that trigger, so evictable outer-join state would
    otherwise never emit its null rows — sentinel batch 1 advances the
    watermark past all real data, sentinel batch 2 gives the engine a
    batch that APPLIES the advanced watermark and flushes the state."""
    spool = spool_dir or tempfile.mkdtemp(prefix="replay_spool_")
    os.makedirs(spool, exist_ok=True)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # contiguous event-time ranges via ntile over (ts, event_id)
    from pyspark.sql import Window

    w = Window.orderBy("ts", "event_id")
    chunked = ev.withColumn("_chunk", F.ntile(n_chunks).over(w))
    for i in range(1, n_chunks + 1):
        part_dir = os.path.join(spool, f"_stage_{i}")
        (
            chunked.filter(F.col("_chunk") == i)
            .drop("_chunk")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(part_dir)
        )
        (part_file,) = glob.glob(os.path.join(part_dir, "part-*.parquet"))
        dest = os.path.join(spool, f"chunk_{i:04d}.parquet")
        shutil.move(part_file, dest)
        shutil.rmtree(part_dir)
        # strictly increasing mtimes: the file source admits files in
        # modification-time order, so this pins chunk order = batch order
        os.utime(dest, (1_600_000_000 + i, 1_600_000_000 + i))
    for j in range(1, sentinel_chunks + 1):
        idx = n_chunks + j
        part_dir = os.path.join(spool, f"_stage_{idx}")
        # Each sentinel chunk carries one far-future row PER EVENT TYPE the
        # downstream query watermarks on: watermarks are computed on the
        # POST-FILTER watermark columns and the global watermark is the MIN
        # across them, so a sentinel that any side filters away advances
        # nothing. Negative user_ids keep sentinels out of every real join
        # key; consumers drop them with event_id/user_id >= 0 filters.
        mx = ev.agg(F.max("ts").alias("mx"))
        sentinel_rows = [
            ("purchase", -1, 999999.0),
            ("error", -2, 0.0),
            ("view", -3, 0.0),
            ("click", -4, 0.0),
            ("signup", -5, 0.0),
        ]
        union = None
        for k, (etype, uid, val) in enumerate(sentinel_rows):
            row = mx.select(
                F.lit(-(j * 10 + k)).cast("long").alias("event_id"),
                (F.col("mx") + F.expr(f"INTERVAL {9 + j} DAYS")).alias("ts"),
                F.lit(uid).cast("long").alias("user_id"),
                F.lit(etype).alias("event_type"),
                F.lit(val).alias("value"),
                F.lit("{}").alias("props"),
            )
            union = row if union is None else union.unionAll(row)
        union.coalesce(1).write.mode("overwrite").parquet(part_dir)
        (part_file,) = glob.glob(os.path.join(part_dir, "part-*.parquet"))
        dest = os.path.join(spool, f"chunk_{idx:04d}.parquet")
        shutil.move(part_file, dest)
        shutil.rmtree(part_dir)
        os.utime(dest, (1_600_000_000 + idx, 1_600_000_000 + idx))
    return spool


def chunked_replay(
    spark: SparkSession,
    sf_dir: str,
    transform: Callable[[DataFrame], DataFrame],
    n_chunks: int = 5,
    output_mode: str = "append",
    spool: str | None = None,
) -> tuple[DataFrame, int]:
    """Replay events through ``transform`` (stream-DF -> stream-DF) in
    ``n_chunks`` micro-batches; returns (result table, batches executed).

    The batch count is read back from the query's progress so tests can
    assert the replay was genuinely multi-batch.

    Pass ``spool`` (from :func:`spool_event_chunks`) to reuse a pre-built
    spool across replays — the bench does this so measured wall time is
    the STREAM's, not the chunk-writing setup's. A caller-provided spool
    is left on disk; an internally-built one is removed."""
    own_spool = spool is None
    if own_spool:
        spool = spool_event_chunks(spark, sf_dir, n_chunks)
    # events_file_stream expects <dir>/events.parquet; the spool holds
    # chunk files directly, so build the reader here with the same dtype
    # normalization (see sources.events_file_stream).
    physical = spark.read.parquet(os.path.join(spool, "chunk_0001.parquet")).schema
    raw = (
        spark.readStream.schema(physical)
        .option("maxFilesPerTrigger", "1")
        .parquet(spool)
    )
    ts_type = dict(raw.dtypes).get("ts")
    if ts_type == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    stream = raw.select("event_id", "ts", "user_id", "event_type", "value", "props")

    out = transform(stream)
    name = "replay_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_replay_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = len(q.recentProgress)
    if own_spool:
        shutil.rmtree(spool, ignore_errors=True)
    return spark.table(name), n_batches
