"""True larger-SF testdata generator (r9 verdict task 3).

Builds a complete 10-table sf0.5 dataset — 5x the sf0.1 row counts with
the driver's cardinality ratios (region/nation fixed, everything else
linear) — so the FULL oracle gate and the bench can run at a genuinely
larger scale, answering what the x-multiplier slope twins cannot: does
the Spark-vs-DuckDB agreement hold, and do plan decisions (AQE
broadcasts, skew handling) stay sane, at 5x the rows.

Construction (distribution-faithful, same recipes as the slope twins in
scale_slope.py, which calibrated within the host-noise band of the real
sf0.1):

- region, nation: copied verbatim (fixed dimensions at every SF);
- customer/supplier/part: replicated with per-replica KEY offsets that
  match the orders/lineitem offsets exactly, so every FK edge stays
  valid and join fan-outs / degree distributions are scale-invariant;
- orders/lineitem: the slope twins' key-offset replication;
- events: replicated with event_id and user_id offsets, ts/type/value/
  props untouched — the time span stays one month and per-user
  interarrival stays constant (users grow with data, the realistic
  growth mode for an event stream);
- documents: NEW text from sf0.1's empirical word-frequency and
  doc-length distributions, exact dups injected at the measured rate
  (verbatim replication would fabricate dup pairs and LSH buckets);
- embeddings: per-label Gaussian fit to sf0.1, label mix empirical.

Usage:  python tests/gen_sf.py [mult] [out_dir]
Default mult=5, out_dir=/tmp/testdata_sf0.5. Writes a _complete.json
marker; reruns are no-ops if the marker exists.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.scale_slope import SRC, build_documents, build_embeddings, build_tpch


def _replicate_keyed(con, out: str, mult: int, table: str, key: str, passthrough: list[str]) -> None:
    base = con.sql(f"SELECT MAX({key})+1 FROM '{SRC}/{table}.parquet'").fetchone()[0]
    cols = ", ".join([f"{key} + r.r*{base} AS {key}"] + passthrough)
    con.sql(
        f"""
        COPY (
          SELECT {cols}
          FROM '{SRC}/{table}.parquet', range({mult}) r(r)
        ) TO '{out}/{table}.parquet' (FORMAT parquet)
        """
    )


def build_sf(mult: int = 5, out: str = "/tmp/testdata_sf0.5") -> str:
    marker = os.path.join(out, "_complete.json")
    if os.path.exists(marker):
        return out
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    rng = np.random.default_rng(1042 + mult)
    t0 = time.time()

    for t in ("region", "nation"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")

    # dimension offsets MUST equal the fact-side offsets in build_tpch
    # (it derives them the same way: MAX(key)+1 over the same sf0.1 files)
    _replicate_keyed(con, out, mult, "customer", "c_custkey",
                     ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"])
    _replicate_keyed(con, out, mult, "supplier", "s_suppkey",
                     ["s_name", "s_nationkey", "s_acctbal"])
    _replicate_keyed(con, out, mult, "part", "p_partkey",
                     ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"])
    build_tpch(con, out, mult)

    eid, uid = con.sql(
        f"SELECT MAX(event_id)+1, MAX(user_id)+1 FROM '{SRC}/events.parquet'"
    ).fetchone()
    con.sql(
        f"""
        COPY (
          SELECT event_id + r.r*{eid} AS event_id, ts,
                 user_id + r.r*{uid} AS user_id,
                 event_type, value, props
          FROM '{SRC}/events.parquet', range({mult}) r(r)
        ) TO '{out}/events.parquet' (FORMAT parquet)
        """
    )

    nd = build_documents(con, out, mult, rng)
    ne = build_embeddings(con, out, mult, rng)
    with open(marker, "w") as fh:
        json.dump(
            {"mult": mult, "src": SRC, "docs": nd, "vecs": ne,
             "gen_sec": round(time.time() - t0, 1)},
            fh,
        )
    return out


if __name__ == "__main__":
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata_sf0.5"
    print(build_sf(mult, out))
