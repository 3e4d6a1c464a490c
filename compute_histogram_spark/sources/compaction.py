"""Small-file compaction — the table-maintenance chore every long-lived
100 TB dataset runs on a schedule.

Streaming sinks, incremental appends and over-parallel writers leave
directories of KB-scale parquet files; scan cost then scales with FILE
COUNT (task scheduling, footer reads, row-group overhead), not bytes.
``compact_parquet`` rewrites a directory to ~``target_mb`` files:

- sizing is driver-side FILE METADATA only (os.listdir + sizes — O(files)
  scalars, never data);
- the rewrite is ``coalesce`` (merges input splits, NO shuffle — the
  whole job is a copy at IO speed) unless the caller asks for
  ``repartition`` to also rebalance skewed file sizes;
- the write lands in ``out_path`` and is VERIFIED (row count in == out)
  before the function returns — corrupt-on-rewrite is the failure mode
  maintenance jobs must never have. Callers swap directories (an
  atomic catalog/location flip on a real lakehouse).

Compression ratio correction: parquet re-encodes on write, so output
size != input size. The file count is derived from the INPUT bytes and
corrected by a caller-tunable ``ratio`` (default 1.0 = assume same
encoding); production jobs pass the ratio observed on the last run.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession


def plan_compaction(
    path: str, target_mb: int = 128
) -> tuple[list[str], int, int]:
    """(parquet files, total bytes, target file count) — pure metadata."""
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    return files, total, n_out


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_mb: int = 128,
    ratio: float = 1.0,
    rebalance: bool = False,
) -> dict:
    """Rewrite ``path`` into ``out_path`` at ~``target_mb`` per file.

    Returns a report dict (files in/out, bytes in/out, rows). Raises if
    the rewrite loses or duplicates rows."""
    files, total, _ = plan_compaction(path, target_mb)
    if not files:
        raise ValueError(f"no parquet files under {path}")
    n_out = max(1, math.ceil(total * ratio / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    n_in = df.count()
    out = df.repartition(n_out) if rebalance else df.coalesce(n_out)
    out.write.mode("overwrite").parquet(out_path)
    n_rows = spark.read.parquet(out_path).count()
    if n_rows != n_in:
        raise RuntimeError(
            f"compaction row mismatch: {n_in} in, {n_rows} out"
        )
    out_files, out_total, _ = plan_compaction(out_path, target_mb)
    return {
        "files_in": len(files),
        "files_out": len(out_files),
        "bytes_in": total,
        "bytes_out": out_total,
        "rows": n_rows,
    }
