"""Format interop (sources/interop.py): ORC and JSONL round-trips are
value-exact, and the ORC scan keeps the pushdown/pruning properties the
parquet plans are audited for."""

import os

import pytest
from pyspark.sql import functions as F

from compute_histogram_spark.sources.interop import (
    convert_table,
    read_table,
    write_table,
)
from compute_histogram_spark.sources.tables import load


def test_orc_round_trip_value_exact(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "events")
    p = str(tmp_path / "events_orc")
    report = convert_table(
        spark, os.path.join(sf_dir, "events.parquet"), p,
        "parquet", "orc",
    )
    assert report["rows"] == src.count()
    back = read_table(spark, p, "orc", src.schema)
    assert back.schema == src.schema
    assert src.exceptAll(back).count() == 0
    assert back.exceptAll(src).count() == 0


def test_orc_scan_pushes_filters_and_prunes_columns(spark, sf_dir, tmp_path):
    p = str(tmp_path / "li_orc")
    write_table(load(spark, sf_dir, "lineitem"), p, "orc")
    df = read_table(
        spark, p, "orc", load(spark, sf_dir, "lineitem").schema
    ).where(F.col("l_quantity") > 45.0).select("l_orderkey", "l_quantity")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split(
        "PushedFilters"
    )[1][:200]
    # pruned read schema: only the two projected columns reach the scan
    rs = plan.split("ReadSchema")[1][:200]
    assert "l_orderkey" in rs and "l_extendedprice" not in rs


def test_jsonl_round_trip_with_schema(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "documents")
    p = str(tmp_path / "docs_jsonl")
    write_table(src, p, "json")
    back = read_table(spark, p, "json", src.schema)
    assert back.schema == src.schema
    assert src.exceptAll(back).count() == 0
    assert back.exceptAll(src).count() == 0


def test_json_without_schema_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="schema"):
        read_table(spark, str(tmp_path), "json")
