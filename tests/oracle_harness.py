"""Local re-implementation of the driver's DuckDB-oracle comparison.

Mirrors the contract in __spark_entry__.py: run the Spark query and the
oracle SQL over the same parquet tables, then compare row count, column
names, and an order-insensitive value multiset (columns sorted by name,
rows sorted by their stringified tuple).
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:  # collapse -0.0 / 0.0 (f-string would keep the sign)
            v = 0.0
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def canonical(rows: list[tuple], cols: list[str]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark, query_fn, oracle: str, sf_dir: str) -> dict:
    sdf = query_fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    res = con.execute(oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    con.close()

    report = {
        "rows_spark": len(s_rows),
        "rows_oracle": len(d_rows),
        "cols_spark": sorted(s_cols),
        "cols_oracle": sorted(d_cols),
        "row_match": len(s_rows) == len(d_rows),
        "col_match": sorted(s_cols) == sorted(d_cols),
        "value_match": False,
        "first_diff": None,
    }
    if report["row_match"] and report["col_match"]:
        cs, cd = canonical(s_rows, s_cols), canonical(d_rows, d_cols)
        report["value_match"] = cs == cd
        if not report["value_match"]:
            for i, (a, b) in enumerate(zip(cs, cd)):
                if a != b:
                    report["first_diff"] = {"i": i, "spark": a, "oracle": b}
                    break
    return report
