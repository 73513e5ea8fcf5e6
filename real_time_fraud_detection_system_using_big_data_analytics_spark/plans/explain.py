"""Physical-plan introspection helpers: capture .explain output as a string
so tests can assert plan properties (filter pushdown, broadcast joins,
partial aggregation, top-k) instead of eyeballing them."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_in_plan(df: DataFrame, *fragments: str, mode: str = "formatted") -> str:
    plan = plan_string(df, mode)
    missing = [f for f in fragments if f not in plan]
    if missing:
        raise AssertionError(f"plan is missing {missing}:\n{plan}")
    return plan


def assert_not_in_plan(df: DataFrame, *fragments: str, mode: str = "formatted") -> str:
    plan = plan_string(df, mode)
    present = [f for f in fragments if f in plan]
    if present:
        raise AssertionError(f"plan unexpectedly contains {present}:\n{plan}")
    return plan
