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
