"""Small-file compaction (sources/compaction.py): metadata sizing, the
no-shuffle rewrite, row-count verification, value preservation."""

import pytest
from pyspark.sql import functions as F

from compute_histogram_spark.sources.compaction import (
    compact_parquet,
    plan_compaction,
)


@pytest.fixture()
def fragmented(spark, tmp_path):
    src = str(tmp_path / "frag")
    spark.range(20000).select(
        F.col("id"), (F.col("id") % 97).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    ).repartition(64).write.parquet(src)
    return src


def test_plan_is_metadata_only(fragmented):
    files, total, n_out = plan_compaction(fragmented, target_mb=1)
    assert len(files) == 64
    assert total > 0
    assert 1 <= n_out < 64


def test_compact_reduces_files_and_preserves_rows(spark, fragmented, tmp_path):
    dst = str(tmp_path / "out")
    report = compact_parquet(spark, fragmented, dst, target_mb=1)
    assert report["files_in"] == 64
    assert report["files_out"] < 16
    assert report["rows"] == 20000
    # value preservation: full anti-join both ways is empty
    a = spark.read.parquet(fragmented)
    b = spark.read.parquet(dst)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_compact_no_shuffle_by_default(spark, fragmented, tmp_path):
    """coalesce path: the rewrite plan must carry no Exchange."""
    files, total, _ = plan_compaction(fragmented, target_mb=1)
    df = spark.read.parquet(fragmented).coalesce(4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_compact_empty_dir_raises(spark, tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    with pytest.raises(ValueError):
        compact_parquet(spark, str(d), str(tmp_path / "o"))


def test_compact_partitioned_layout_preserved(spark, tmp_path):
    """Hive-partitioned (nested) datasets: recursive Hadoop-FS listing
    finds the files, and the rewrite preserves the partition columns."""
    src = str(tmp_path / "part_src")
    dst = str(tmp_path / "part_dst")
    spark.range(6000).select(
        F.col("id"), (F.col("id") % 3).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    ).repartition(24).write.partitionBy("k").parquet(src)

    files, total, _ = plan_compaction(src, target_mb=1, spark=spark)
    assert len(files) > 3 and total > 0
    assert all("k=" in f for f in files)

    report = compact_parquet(spark, src, dst, target_mb=64)
    assert report["rows"] == 6000
    assert report["partition_columns"] == ["k"]
    assert report["files_out"] < report["files_in"]
    b = spark.read.parquet(dst)
    assert sorted(b.columns) == ["id", "k", "pad"]
    a = spark.read.parquet(src)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_compact_repartition_fallback_when_reader_packs(spark, tmp_path):
    """When the reader packs the inputs into fewer splits than the
    target file count, coalesce can't reach it — the rewrite must fall
    back to repartition instead of silently writing oversized files."""
    src = str(tmp_path / "tiny_src")
    dst = str(tmp_path / "tiny_dst")
    spark.range(50000).select(
        F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    ).coalesce(1).write.parquet(src)
    # ~5 MB in one file; ask for ~1 MB files -> n_out > 1 read split
    report = compact_parquet(spark, src, dst, target_mb=1)
    assert report["strategy"] == "repartition"
    assert report["files_out"] > 1
    assert report["rows"] == 50000
