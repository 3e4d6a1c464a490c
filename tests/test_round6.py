"""Round-6 additions: the registered histogram-inverted equi-depth path
(no raw-data global sort), the bm25 TakeOrdered top-k shape, and bm25/binned
plan-shape assertions."""

from pyspark.sql import Row, functions as F

from compute_histogram_spark.operators import deciles as D
from compute_histogram_spark.operators import text as TX
from compute_histogram_spark.sources.tables import load


# ---------------------------------------------------------------------------
# equi-depth: histogram-inverted registered path vs exact ntile twin
# ---------------------------------------------------------------------------


def test_equi_depth_binned_matches_exact_within_bin_granularity(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    exact = D.equi_depth_histogram(ev, "value", "event_id", buckets=10).collect()
    binned = D.equi_depth_histogram_binned(ev, "value", buckets=10).collect()
    n = sum(r["n_rows"] for r in exact)
    assert sum(r["n_rows"] for r in binned) == n  # partition of the data
    # bucket ids ascend; ranges tile the domain monotonically
    ids = [r["bucket"] for r in binned]
    assert ids == sorted(ids) and ids[0] == 1
    for lo, hi in zip(binned, binned[1:]):
        assert lo["max_value"] <= hi["min_value"]
    # each bucket within ideal depth +/- the heaviest bin (a bin is never
    # split, so that is the exact worst-case deviation)
    max_bin = (
        ev.where(F.col("value").isNotNull() & ~F.isnan("value"))
        .groupBy((F.col("value") * 100).cast("bigint"))
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    for r in binned:
        assert abs(r["n_rows"] - n / 10) <= max_bin + n / 100


def test_equi_depth_binned_zero_and_negative_values(spark):
    # trunc-toward-zero binning around 0 must not merge or misorder buckets
    rows = [Row(v=float(x)) for x in
            [-2.5, -1.01, -1.0, -0.5, -0.01, 0.0, 0.01, 0.5, 1.0, 2.5]]
    out = D.equi_depth_histogram_binned(
        spark.createDataFrame(rows), "v", buckets=5
    ).collect()
    assert sum(r["n_rows"] for r in out) == len(rows)
    for lo, hi in zip(out, out[1:]):
        assert lo["max_value"] <= hi["min_value"]


def test_equi_depth_binned_window_input_is_bin_bounded(spark, sf_dir):
    # the only global window runs over the per-bin aggregate: a
    # HashAggregate must sit between the file scan and the Window
    ev = load(spark, sf_dir, "events")
    plan = (
        D.equi_depth_histogram_binned(ev, "value")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ntile(" not in plan
    # below the LAST (deepest) window there must be an aggregate before the
    # scan: the window consumes per-bin rows, never raw table rows
    below_win = plan[plan.rfind("Window ") :]
    agg_pos = below_win.find("HashAggregate")
    scan_pos = below_win.find("FileScan")
    assert 0 < agg_pos < scan_pos  # tree prints root-first


# ---------------------------------------------------------------------------
# bm25: top-k must be a TakeOrdered partial merge, not a global rank window
# ---------------------------------------------------------------------------


def test_bm25_topk_plan_uses_take_ordered(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    df = TX.bm25_topk(docs, ("the", "of"), k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bm25_topk_ranks_are_dense_and_sorted(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    out = TX.bm25_topk(docs, ("the", "of"), k=10).collect()
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
    scores = [r["bm25"] for r in out]
    assert scores == sorted(scores, reverse=True)
