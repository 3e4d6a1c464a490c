"""Physical-layout levers, proven at the PLAN level: bucketed joins must
show zero Exchange; partition-column predicates must show PartitionFilters
(directory pruning), not data filters."""

import os

from pyspark.sql import functions as F

from compute_histogram_spark.sources import bucketing as B
from compute_histogram_spark.sources.tables import load


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    # warehouse.dir is static; a db LOCATION keeps test tables in tmp_path
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{tmp_path / 'wh'}'")
    spark.catalog.setCurrentDatabase("bktest")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    B.write_bucketed(orders, "bktest.o_b", "o_orderkey", buckets=8)
    B.write_bucketed(lineitem, "bktest.l_b", "l_orderkey", buckets=8)

    joined = B.bucketed_join(spark, "bktest.o_b", "bktest.l_b", "o_orderkey", "l_orderkey")
    # disable broadcast so the join would OTHERWISE be a shuffle SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(joined)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" in plan
    # and the result is right
    assert joined.count() == lineitem.count()


def test_partitioned_write_prunes_directories(spark, sf_dir, tmp_path):
    events = load(spark, sf_dir, "events")
    path = str(tmp_path / "ev_part")
    B.write_partitioned(events, path, ["event_type"])
    # one directory per event_type
    dirs = {d for d in os.listdir(path) if d.startswith("event_type=")}
    assert len(dirs) == 5

    pruned = B.read_pruned(spark, path).where(F.col("event_type") == "click")
    plan = _plan(pruned)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]
    n_click = events.where(F.col("event_type") == "click").count()
    assert pruned.count() == n_click


def test_dynamic_partition_overwrite_is_incremental(spark, sf_dir, tmp_path):
    """Dynamic mode rewrites ONLY the partitions present in the incoming
    batch — the incremental-update pattern for a partitioned 100 TB table
    (static mode would wipe every other partition)."""
    events = load(spark, sf_dir, "events")
    path = str(tmp_path / "ev_incr")
    B.write_partitioned(events, path, ["event_type"])
    n_click = spark.read.parquet(path).where("event_type = 'click'").count()
    n_total = spark.read.parquet(path).count()

    update = (
        events.where("event_type = 'click'").limit(10)
    )  # a small click-only batch
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        update.write.mode("overwrite").partitionBy("event_type").parquet(path)
    finally:
        if old:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
        else:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")

    back = spark.read.parquet(path)
    assert back.where("event_type = 'click'").count() == 10  # replaced
    assert back.count() == n_total - n_click + 10  # others untouched


def test_merge_schema_evolution(spark, tmp_path):
    """Schema evolution across file generations: new columns appear as
    nulls for old files under mergeSchema — the append-only contract for
    long-lived landing tables."""
    from pyspark.sql import Row

    p = str(tmp_path / "evolving")
    spark.createDataFrame([Row(id=1, a="x")]).write.parquet(p + "/gen=1")
    spark.createDataFrame([Row(id=2, a="y", b=3.5)]).write.parquet(p + "/gen=2")
    df = spark.read.option("mergeSchema", "true").parquet(p)
    rows = {r["id"]: (r["a"], r["b"]) for r in df.collect()}
    assert rows == {1: ("x", None), 2: ("y", 3.5)}
