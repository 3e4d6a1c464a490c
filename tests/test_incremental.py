"""Incremental (delta-merged) histogram == one-shot recompute."""

import pytest

from compute_histogram_spark.operators import histogram as H
from compute_histogram_spark.operators import incremental as INC
from compute_histogram_spark.plans.bin_scheme import BinScheme
from compute_histogram_spark.sources.tables import load


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load(spark, sf_dir, "events")


@pytest.fixture(scope="module")
def scheme(events):
    mn, mx = H.compute_min_max(events, "value")
    return BinScheme.from_min_max(mn, mx, "linear")


def _as_dict(df):
    return {r["bin"]: (r["value"], r["pixel_count"]) for r in df.collect()}


def test_two_delta_merge_equals_full(events, scheme):
    full = _as_dict(H.histogram(events, "value", "linear"))
    deltas = [
        INC.delta_counts(events.where(f"event_id % 2 = {i}"), "value", scheme)
        for i in range(2)
    ]
    inc = _as_dict(INC.finalize(INC.merge_states(*deltas), scheme))
    assert inc == full


def test_merge_is_associative(events, scheme):
    a, b, c = [
        INC.delta_counts(events.where(f"event_id % 3 = {i}"), "value", scheme)
        for i in range(3)
    ]
    left = _as_dict(INC.finalize(INC.merge_states(INC.merge_states(a, b), c), scheme))
    right = _as_dict(INC.finalize(INC.merge_states(a, INC.merge_states(b, c)), scheme))
    assert left == right


def test_persisted_state_roundtrip(events, scheme, tmp_path):
    # the real incremental workflow: persist day-1 state, later merge day-2
    # delta against the RELOADED state — must equal the full recompute
    spark = events.sparkSession
    d1 = INC.delta_counts(events.where("event_id % 2 = 0"), "value", scheme)
    path = str(tmp_path / "state")
    d1.write.parquet(path)
    reloaded = spark.read.parquet(path)
    d2 = INC.delta_counts(events.where("event_id % 2 = 1"), "value", scheme)
    inc = _as_dict(INC.finalize(INC.merge_states(reloaded, d2), scheme))
    assert inc == _as_dict(H.histogram(events, "value", "linear"))


def test_tagged_states_equal_per_delta_states(events, scheme):
    """r16 single-scan rewrite: delta_counts_tagged(df, .., tag) must
    emit, per tag value, EXACTLY the state delta_counts builds from the
    per-delta filtered scan — the registry's histogram_incremental now
    rides the tagged form (one events scan instead of one per delta)."""
    from pyspark.sql import functions as F

    for mod in (2, 3):
        tagged = INC.delta_counts_tagged(
            events.where(F.col("event_id") % mod >= 0),
            "value",
            scheme,
            F.col("event_id") % mod,
        )
        got = {
            (r["delta"], r["bin"]): r["pixel_count"] for r in tagged.collect()
        }
        want = {}
        for i in range(mod):
            st = INC.delta_counts(
                events.where(f"event_id % {mod} = {i}"), "value", scheme
            )
            for r in st.collect():
                want[(i, r["bin"])] = r["pixel_count"]
        assert got == want


def test_tagged_merge_equals_full(events, scheme):
    """Merging the tagged states (the registry plan) == full recompute."""
    from pyspark.sql import functions as F

    delta = F.col("event_id") % 2
    states = INC.delta_counts_tagged(
        events.where(delta.isin(0, 1)), "value", scheme, delta
    )
    inc = _as_dict(INC.finalize(INC.merge_states(states), scheme))
    assert inc == _as_dict(H.histogram(events, "value", "linear"))


def test_empty_delta_is_identity(events, scheme):
    d = INC.delta_counts(events, "value", scheme)
    empty = INC.delta_counts(events.where("event_id < 0"), "value", scheme)
    merged = _as_dict(INC.finalize(INC.merge_states(d, empty), scheme))
    assert merged == _as_dict(INC.finalize(d, scheme))


def test_apply_changes_golden(spark):
    """Every MERGE branch on a hand-built snapshot + change feed."""
    from pyspark.sql import Row

    snap = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
    )
    changes = spark.createDataFrame(
        [
            Row(k=1, v="a2", seq=1, op="u"),   # update existing
            Row(k=2, v=None, seq=1, op="d"),   # delete existing
            Row(k=4, v="new", seq=1, op="u"),  # insert new key
            Row(k=3, v="x", seq=1, op="u"),    # overridden by later delete
            Row(k=3, v=None, seq=2, op="d"),
            Row(k=5, v="tie", seq=7, op="u"),  # seq tie: delete wins
            Row(k=5, v=None, seq=7, op="d"),
        ]
    )
    out = sorted(
        (r["k"], r["v"])
        for r in INC.apply_changes(snap, changes, key_col="k").collect()
    )
    assert out == [(1, "a2"), (4, "new")]


UPSERT_ORACLE = """
WITH snap AS (SELECT o_orderkey, o_totalprice FROM orders),
changes AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 17 = 3 THEN o_totalprice + 5.0
                ELSE o_totalprice END AS o_totalprice,
           1 AS seq,
           CASE WHEN o_orderkey % 17 = 3 THEN 'u' ELSE 'd' END AS op
    FROM orders WHERE o_orderkey % 17 IN (3, 5)
    UNION ALL
    SELECT o_orderkey, o_totalprice + 1.0, 2,
           CASE WHEN o_orderkey % 17 = 3 THEN 'd' ELSE 'u' END
    FROM orders WHERE o_orderkey % 17 IN (3, 5)
),
latest AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (
            PARTITION BY o_orderkey ORDER BY seq DESC, op ASC) AS rn
        FROM changes) WHERE rn = 1
)
SELECT o_orderkey, o_totalprice FROM snap
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM latest)
UNION ALL
SELECT o_orderkey, o_totalprice FROM latest WHERE op = 'u'
ORDER BY o_orderkey
"""


def test_apply_changes_vs_duckdb_oracle(spark, sf_dir):
    """Value-exact DuckDB MERGE twin on the real orders table (outside the
    50-entry registry window; oracle evidence lives here)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from check_oracle import compare, duck_connection

    from compute_histogram_spark.sources.tables import load

    orders = load(spark, sf_dir, "orders")
    sdf = INC.orders_upsert_demo(orders).toPandas()
    con = duck_connection(sf_dir)
    odf = con.sql(UPSERT_ORACLE).df()
    n = orders.count()
    assert len(sdf) > 0
    # deletes shrank the snapshot; upserted keys (%17==5) survive repriced
    assert len(sdf) < n
    assert compare("orders_upsert_demo", sdf, odf) == []
