"""Registry entry for the applyInPandasWithState velocity operator."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from .velocity import run_velocity_hermetic


@register(
    "stream_velocity_stateful",
    oracle="""
    SELECT user_id, event_id,
           CAST(COUNT(*) OVER w - 1 AS BIGINT) AS n_prior_10m,
           ROUND(SUM(value) OVER w - value, 2) AS sum_prior_10m
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
    """,
)
def stream_velocity_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    trailing-10-minute event count and value sum, computed incrementally
    with keyed state. The oracle is the batch RANGE-frame formulation —
    streaming state and batch window MUST agree on an in-order replay.

    Caveat vs the batch frame: RANGE frames include timestamp peers; the
    stateful buffer is strictly 'rows seen before me' in (ts, event_id)
    order. The events table has microsecond timestamps (no exact peers), so
    the two definitions coincide here; the unit test pins the tie behavior
    explicitly.
    """
    out = run_velocity_hermetic(spark, sf_dir)
    return out.select(
        "user_id",
        "event_id",
        F.col("n_prior_10m").cast("bigint"),
        F.round("sum_prior_10m", 2).alias("sum_prior_10m"),
    )
