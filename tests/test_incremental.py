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


def test_empty_delta_is_identity(events, scheme):
    d = INC.delta_counts(events, "value", scheme)
    empty = INC.delta_counts(events.where("event_id < 0"), "value", scheme)
    merged = _as_dict(INC.finalize(INC.merge_states(d, empty), scheme))
    assert merged == _as_dict(INC.finalize(d, scheme))
