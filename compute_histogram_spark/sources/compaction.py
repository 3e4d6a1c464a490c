"""Small-file compaction — the table-maintenance chore every long-lived
100 TB dataset runs on a schedule.

Streaming sinks, incremental appends and over-parallel writers leave
directories of KB-scale parquet files; scan cost then scales with FILE
COUNT (task scheduling, footer reads, row-group overhead), not bytes.
``compact_parquet`` rewrites a directory to ~``target_mb`` files:

- sizing is driver-side FILE METADATA only, listed through the Hadoop
  ``FileSystem`` API (recursive ``listFiles``) so the SAME code paths
  work on ``file://``, ``s3a://``, ``hdfs://``, ... — O(files)
  scalars, never data;
- hive-style partitioned layouts (``k=v`` directory segments) are
  detected from the listed paths and PRESERVED: the rewrite writes
  with ``partitionBy`` on the discovered partition columns;
- the rewrite is ``coalesce`` (merges input splits, NO shuffle — the
  whole job is a copy at IO speed). ``coalesce`` can only DECREASE the
  partition count, so when the reader packs the small files into fewer
  splits than the target file count the rewrite falls back to
  ``repartition`` (one round-robin shuffle) rather than silently
  producing oversized files; callers can also force ``rebalance=True``
  to even out skewed file sizes;
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

from pyspark.sql import SparkSession


def _resolve_spark(spark: SparkSession | None) -> SparkSession:
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            "plan_compaction needs a SparkSession (for Hadoop FileSystem "
            "listing); none was passed and none is active"
        )
    return spark


def _list_parquet(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """Recursively list (uri, bytes) of *.parquet under ``path`` via the
    Hadoop FileSystem API — works on any URI scheme the cluster can
    read (file://, s3a://, hdfs://), unlike os.listdir."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    if not fs.exists(jpath):
        return []
    it = fs.listFiles(jpath, True)  # True = recursive
    files = []
    while it.hasNext():
        st = it.next()
        uri = st.getPath().toString()
        name = uri.rsplit("/", 1)[-1]
        if name.endswith(".parquet") and not name.startswith((".", "_")):
            files.append((uri, int(st.getLen())))
    return sorted(files)


def _partition_columns(root: str, file_uris: list[str]) -> list[str]:
    """Hive-style partition column names (``k=v`` path segments between
    the dataset root and the files), in directory order."""
    root = root.rstrip("/")
    # Compare on the path part only — the FS may have qualified the URIs
    # (file:/x vs /x), so anchor on the root's trailing path.
    root_tail = root.split("://")[-1].lstrip("/")
    for uri in file_uris:
        tail = uri.split("://")[-1].lstrip("/")
        if root_tail and root_tail in tail:
            rel = tail.split(root_tail, 1)[1].strip("/")
            segs = rel.split("/")[:-1]  # drop the filename
            cols = [s.split("=", 1)[0] for s in segs if "=" in s]
            if cols:
                return cols
    return []


def plan_compaction(
    path: str, target_mb: int = 128, spark: SparkSession | None = None
) -> tuple[list[str], int, int]:
    """(parquet file URIs, total bytes, target file count) — pure
    metadata, via the Hadoop FileSystem (recursive, any URI scheme)."""
    spark = _resolve_spark(spark)
    listed = _list_parquet(spark, path)
    files = [u for u, _ in listed]
    total = sum(sz for _, sz in listed)
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
    """Rewrite ``path`` into ``out_path`` at ~``target_mb`` per file,
    preserving a hive-partitioned layout if one is detected.

    Returns a report dict (files in/out, bytes in/out, rows, strategy,
    partition columns). Raises if the rewrite loses or duplicates rows."""
    files, total, _ = plan_compaction(path, target_mb, spark)
    if not files:
        raise ValueError(f"no parquet files under {path}")
    n_out = max(1, math.ceil(total * ratio / (target_mb * 1024 * 1024)))
    part_cols = _partition_columns(path, files)
    df = spark.read.parquet(path)
    n_in = df.count()
    # coalesce merges splits without a shuffle but can never INCREASE
    # the partition count — if the reader packed the inputs into fewer
    # splits than n_out, fall back to repartition so output files hit
    # the size target instead of silently exceeding it.
    n_read = df.rdd.getNumPartitions()
    if rebalance or n_read < n_out:
        out, strategy = df.repartition(n_out), "repartition"
    else:
        out, strategy = df.coalesce(n_out), "coalesce"
    writer = out.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(out_path)
    n_rows = spark.read.parquet(out_path).count()
    if n_rows != n_in:
        raise RuntimeError(
            f"compaction row mismatch: {n_in} in, {n_rows} out"
        )
    out_files, out_total, _ = plan_compaction(out_path, target_mb, spark)
    return {
        "files_in": len(files),
        "files_out": len(out_files),
        "bytes_in": total,
        "bytes_out": out_total,
        "rows": n_rows,
        "strategy": strategy,
        "partition_columns": part_cols,
    }
