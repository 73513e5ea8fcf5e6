"""Local re-implementation of the driver's DuckDB-oracle comparison.

Mirrors the contract in __spark_entry__.py: run the Spark query and the
oracle SQL over the same parquet tables, then compare row count, column
names, result TYPES, and an order-insensitive typed value multiset.

Type strictness matters: the driver's value hash is type-sensitive, so a
DuckDB ``SUM(BIGINT)`` that widens to HUGEINT (Arrow decimal128(38,0))
hash-mismatches a Spark BIGINT even when every value is numerically equal.
Round 2 proved that a lenient string-normalizing comparison here passes
queries the driver fails — hence this harness compares at the Arrow level:

- column types must normalize to the same Arrow type (timezone stripped
  from timestamps — Spark reports tz=UTC where DuckDB is naive, both pinned
  to UTC by sources/tables.py);
- values compare exactly (no %.6f smoothing); floats must be bit-equal,
  which holds because every float-producing registered query rounds on
  both sides.
"""

from __future__ import annotations

import datetime as _dt
import math
from typing import Any

import duckdb
import pyarrow as pa

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


def norm_type(t: pa.DataType) -> str:
    """Canonical string for an Arrow type: tz dropped from timestamps (both
    engines are pinned to UTC), large_string folded into string, nested
    types normalized recursively. decimal128 keeps (precision, scale) —
    that's exactly the width drift this harness exists to catch."""
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit}]"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{norm_type(t.value_type)}>"
    if pa.types.is_map(t):
        return f"map<{norm_type(t.key_type)},{norm_type(t.item_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{norm_type(f.type)}" for f in t)
        return f"struct<{inner}>"
    return str(t)


def _norm_value(v: Any) -> Any:
    """Normalize representation-only differences, preserving type identity
    everywhere the driver's hash is sensitive to it."""
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v
    if isinstance(v, float) and v == 0.0:  # collapse -0.0 / 0.0
        return 0.0
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_value(x)) for k, x in v.items()))
    return v


def _sort_key(v: Any) -> str:
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.17g}"
    if isinstance(v, tuple):
        return "[" + ",".join(_sort_key(x) for x in v) + "]"
    return str(v)


def _eq(a: Any, b: Any) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    # type identity is enforced at the schema level (type_match); here plain
    # equality is exact (ints, Decimals, strings, dates)
    return a == b


def _canonical_arrow(tbl: pa.Table) -> tuple[dict[str, str], list[tuple]]:
    order = sorted(tbl.column_names)
    types = {n: norm_type(tbl.schema.field(n).type) for n in order}
    cols = [tbl.column(n).to_pylist() for n in order]
    rows = [tuple(_norm_value(c[i]) for c in cols) for i in range(tbl.num_rows)]
    rows.sort(key=lambda r: tuple(_sort_key(v) for v in r))
    return types, rows


def compare(spark, query_fn, oracle: str, sf_dir: str) -> dict:
    sdf = query_fn(spark, sf_dir)
    s_tbl = sdf.toArrow()

    con = duckdb_connection(sf_dir)
    d_tbl = con.execute(oracle).fetch_arrow_table()
    con.close()

    s_types, s_rows = _canonical_arrow(s_tbl)
    d_types, d_rows = _canonical_arrow(d_tbl)

    report = {
        "rows_spark": len(s_rows),
        "rows_oracle": len(d_rows),
        "cols_spark": sorted(s_tbl.column_names),
        "cols_oracle": sorted(d_tbl.column_names),
        "types_spark": s_types,
        "types_oracle": d_types,
        "row_match": len(s_rows) == len(d_rows),
        "col_match": sorted(s_tbl.column_names) == sorted(d_tbl.column_names),
        "type_match": s_types == d_types,
        "value_match": False,
        "first_diff": None,
    }
    if report["row_match"] and report["col_match"]:
        ok = True
        for i, (a, b) in enumerate(zip(s_rows, d_rows)):
            if not all(_eq(x, y) for x, y in zip(a, b)):
                report["first_diff"] = {"i": i, "spark": repr(a), "oracle": repr(b)}
                ok = False
                break
        # driver-faithful: a value hash over typed data can only match when
        # the types match too
        report["value_match"] = ok and report["type_match"]
        if ok and not report["type_match"]:
            diff = {
                n: (s_types.get(n), d_types.get(n))
                for n in s_types
                if s_types.get(n) != d_types.get(n)
            }
            report["first_diff"] = {"type_diff": diff}
    return report
