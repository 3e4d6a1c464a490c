"""Format interop: convert tables between columnar/row formats with
verified round-trips — the migration chore of a long-lived warehouse
(parquet today, an ORC-side consumer tomorrow, JSONL for exchange).

All Spark-native readers/writers (zero extra deps): parquet and ORC are
both columnar with predicate pushdown + column pruning (the plan-level
properties are asserted in tests for BOTH, not assumed), JSONL is the
schema-on-read exchange format — the reader takes the writer's schema
so timestamps and nested arrays survive exactly.

``convert_table`` verifies the rewrite the way compaction does (row
count in == out) and returns a report; callers pair it with
``pipeline.corpus_checksum`` for order-insensitive content equality
when migrating document corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

FORMATS = ("parquet", "orc", "json")


def write_table(df: DataFrame, path: str, fmt: str = "orc") -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    df.write.mode("overwrite").format(fmt).save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str = "orc", schema=None
) -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    elif fmt == "json":
        raise ValueError(
            "json round-trips require the writer's schema — inference "
            "widens ints and stringifies timestamps silently"
        )
    return r.load(path)


def convert_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    src_fmt: str = "parquet",
    dst_fmt: str = "orc",
    src_schema=None,
) -> dict:
    """Rewrite ``src_path`` into ``dst_fmt`` at ``dst_path``; verified
    (row count in == out) before returning."""
    df = read_table(spark, src_path, src_fmt, src_schema)
    n_in = df.count()
    write_table(df, dst_path, dst_fmt)
    n_out = read_table(spark, dst_path, dst_fmt, df.schema).count()
    if n_in != n_out:
        raise RuntimeError(f"convert row mismatch: {n_in} in, {n_out} out")
    return {"rows": n_in, "src_fmt": src_fmt, "dst_fmt": dst_fmt}
