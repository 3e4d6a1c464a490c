"""Profiling operators: single-pass null/distinct profile, 2-D histogram."""

from pyspark.sql import Row, functions as F

from compute_histogram_spark.operators import profile as PR


def test_null_profile_counts(spark):
    rows = [
        Row(a=1, b="x", v=1.0),
        Row(a=None, b="x", v=float("nan")),
        Row(a=3, b=None, v=None),
        Row(a=3, b="y", v=2.5),
    ]
    out = {r["column"]: r for r in PR.null_profile(spark.createDataFrame(rows)).collect()}
    assert set(out) == {"a", "b", "v"}
    assert all(r["n_rows"] == 4 for r in out.values())
    assert (out["a"]["n_null"], out["a"]["n_distinct"]) == (1, 2)
    assert (out["b"]["n_null"], out["b"]["n_distinct"]) == (1, 2)
    assert (out["v"]["n_null"], out["v"]["n_nan"]) == (1, 1)
    assert out["a"]["n_nan"] == 0  # non-float column: NaN metric pinned to 0


def test_null_profile_is_single_job(spark):
    # the whole profile must be ONE aggregation plan (single scan), not a
    # per-column loop: exactly one row before the unpivot
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("g"), (F.col("id") * 1.5).alias("x")
    )
    plan = PR.null_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan") <= 2  # one source scan (+AQE reuse at most)


def test_histogram_2d_bins(spark):
    ns_per_hour = 3_600 * 10**9
    rows = [
        Row(ts=0 * ns_per_hour, value=10.0),     # hour 0, bin 0
        Row(ts=1 * ns_per_hour, value=60.0),     # hour 1, bin 1
        Row(ts=25 * ns_per_hour, value=60.0),    # hour 1 again (day 2)
        Row(ts=1 * ns_per_hour, value=float("nan")),
    ]
    out = {(r["hour"], r["bin"]): r["n_events"] for r in PR.histogram_2d(
        spark.createDataFrame(rows)).collect()}
    assert out == {(0, 0): 1, (1, 1): 2}
