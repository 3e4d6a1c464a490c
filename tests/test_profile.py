"""Profiling operators: single-pass null/distinct profile, 2-D histogram."""

import numpy as np
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


def test_distribution_drift_golden(spark):
    """Identical distributions -> PSI ~ 0; a shifted one -> large PSI;
    bins missing from one side get smoothed, not dropped or infinite."""
    ref = spark.createDataFrame([Row(value=float(v)) for v in
                                 [10, 10, 60, 60, 110, 110]])
    same = spark.createDataFrame([Row(value=float(v)) for v in
                                  [10, 10, 60, 60, 110, 110]])
    shifted = spark.createDataFrame([Row(value=float(v)) for v in
                                     [210, 210, 260, 260, 310, 310]])
    psi_same = sum(r["psi_term"] for r in
                   PR.distribution_drift(ref, same).collect())
    psi_shift = sum(r["psi_term"] for r in
                    PR.distribution_drift(ref, shifted).collect())
    assert abs(psi_same) < 1e-9
    assert psi_shift > 0.25  # "major shift" territory
    rows = PR.distribution_drift(ref, shifted).collect()
    assert all(np.isfinite(r["psi_term"]) for r in rows)
    # disjoint supports: every bin exists on exactly one side
    assert all((r["n_ref"] == 0) != (r["n_cur"] == 0) for r in rows)


def test_distribution_drift_vs_duckdb_oracle(spark, sf_dir):
    """Value-exact DuckDB twin on the real events table, ref/cur split by
    event_type (same smoothing arithmetic, ln, round 6)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from check_oracle import compare, duck_connection

    from compute_histogram_spark.sources.tables import load

    ev = load(spark, sf_dir, "events")
    ref = ev.where(F.col("event_type") != "purchase")
    cur = ev.where(F.col("event_type") == "purchase")
    sdf = PR.distribution_drift(ref, cur).toPandas()
    con = duck_connection(sf_dir)
    odf = con.sql("""
    WITH r AS (
        SELECT CAST(floor(value / 50.0) AS BIGINT) AS bin, count(*) AS n_ref
        FROM events WHERE event_type != 'purchase'
          AND value IS NOT NULL AND NOT isnan(value) GROUP BY 1
    ),
    c AS (
        SELECT CAST(floor(value / 50.0) AS BIGINT) AS bin, count(*) AS n_cur
        FROM events WHERE event_type = 'purchase'
          AND value IS NOT NULL AND NOT isnan(value) GROUP BY 1
    ),
    j AS (
        SELECT COALESCE(r.bin, c.bin) AS bin,
               COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
        FROM r FULL OUTER JOIN c ON r.bin = c.bin
    ),
    t AS (SELECT sum(n_ref) t_ref, sum(n_cur) t_cur, count(*) n_bins FROM j)
    SELECT bin, bin * 50.0 AS bin_value, n_ref, n_cur,
           round(
             ((n_cur + 0.5) / (t_cur + 0.5 * n_bins)
              - (n_ref + 0.5) / (t_ref + 0.5 * n_bins))
             * ln(((n_cur + 0.5) / (t_cur + 0.5 * n_bins))
                  / ((n_ref + 0.5) / (t_ref + 0.5 * n_bins))), 6)
             AS psi_term
    FROM j CROSS JOIN t ORDER BY bin
    """).df()
    assert len(sdf) > 0
    assert compare("distribution_drift", sdf, odf) == []


def test_robust_outliers_golden(spark):
    rows = (
        [Row(event_type="a", value=float(v)) for v in range(1, 12)]  # 1..11
        + [Row(event_type="a", value=1000.0)]                        # outlier
        + [Row(event_type="b", value=5.0)] * 6                       # constant
    )
    out = {r["group"]: r for r in
           PR.robust_outliers(spark.createDataFrame(rows)).collect()}
    a = out["a"]
    assert a["median"] == 6.5 and a["n_rows"] == 12
    assert a["n_outliers"] == 1          # only the 1000.0
    b = out["b"]
    assert b["mad"] == 0.0 and b["n_outliers"] == 0  # zero-MAD guarded


def test_robust_outliers_vs_duckdb_oracle(spark, sf_dir):
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from check_oracle import compare, duck_connection

    from compute_histogram_spark.sources.tables import load

    sdf = PR.robust_outliers(load(spark, sf_dir, "events")).toPandas()
    con = duck_connection(sf_dir)
    odf = con.sql("""
    WITH clean AS (
        SELECT event_type AS "group", value AS x FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)
    ),
    med AS (
        SELECT "group", round(median(x), 6) AS median FROM clean GROUP BY 1
    ),
    dev AS (
        SELECT c."group", c.x, m.median, abs(c.x - m.median) AS adev
        FROM clean c JOIN med m USING ("group")
    ),
    mad AS (
        SELECT "group", round(median(adev), 6) AS mad FROM dev GROUP BY 1
    )
    SELECT d."group",
           count(*) AS n_rows,
           any_value(d.median) AS median,
           any_value(md.mad) AS mad,
           count(CASE WHEN md.mad > 0
                       AND 0.6745 * d.adev / md.mad > 3.5 THEN 1 END)
               AS n_outliers
    FROM dev d JOIN mad md USING ("group")
    GROUP BY 1 ORDER BY 1
    """).df()
    assert len(sdf) > 0
    assert compare("robust_outliers", sdf, odf) == []
