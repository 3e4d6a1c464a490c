"""The driver-side cardinality gate (plans/broadcast_gate.py).

The gate exists for filter-derived dimension slices whose STATIC size
estimate (pre-filter file bytes) blocks a broadcast their runtime size
earns — TPC-H q8/q11/q17/q19 at sf100 took full 600M-row fact shuffles
for slices of 0.2–3.3M keys (tools/tpch_sweep_sf100.json). These tests
pin the decision logic (fits -> hint present; too big -> plan
unchanged), the count cache, and the plan shape of the four gated
queries at test scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from compute_histogram_spark.plans import broadcast_gate as BG
from compute_histogram_spark.sources.tables import load


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_broadcast_applied_when_slice_fits(spark, sf_dir):
    part = load(spark, sf_dir, "part")
    lineitem = load(spark, sf_dir, "lineitem")
    p = part.where(F.col("p_brand") == "Brand#1").select("p_partkey")
    j = lineitem.join(BG.broadcast_if_fits(p, budget_bytes=1 << 30),
                      lineitem["l_partkey"] == p["p_partkey"])
    assert "BroadcastHashJoin" in _plan(j)


def test_no_broadcast_when_budget_exceeded(spark, sf_dir):
    part = load(spark, sf_dir, "part")
    lineitem = load(spark, sf_dir, "lineitem")
    p = part.where(F.col("p_brand") == "Brand#1").select("p_partkey")
    gated = BG.broadcast_if_fits(p, budget_bytes=0)
    j = lineitem.join(gated, lineitem["l_partkey"] == p["p_partkey"])
    # the gate refused: no broadcast HINT was attached (AQE may still
    # choose a runtime broadcast from observed sizes — that is its call,
    # not the gate's), so the logical plan carries no ResolvedHint
    assert gated is p  # the gate returned the input untouched


def test_count_cache_reused_across_calls(spark, sf_dir):
    part = load(spark, sf_dir, "part")
    p = part.where(F.col("p_brand") == "Brand#2").select("p_partkey")
    key = p.semanticHash()
    BG._COUNT_CACHE.pop(key, None)
    n1 = BG.counted_rows(p)
    assert BG._COUNT_CACHE[key] == n1
    # mutate the cache: a second call must read it, not re-count
    BG._COUNT_CACHE[key] = n1 + 7
    assert BG.counted_rows(p) == n1 + 7
    BG._COUNT_CACHE[key] = n1  # restore


def test_known_rows_upper_bound_skips_count(spark, sf_dir):
    part = load(spark, sf_dir, "part")
    p = part.where(F.col("p_brand") == "Brand#3").select("p_partkey")
    key = p.semanticHash()
    BG._COUNT_CACHE.pop(key, None)
    out = BG.broadcast_if_fits(p, budget_bytes=1 << 30, known_rows=10)
    assert key not in BG._COUNT_CACHE  # no count job was triggered
    assert out is not p  # hint applied


def test_est_row_bytes_schema_driven(spark, sf_dir):
    part = load(spark, sf_dir, "part")
    one = part.select("p_partkey")
    two = part.select("p_partkey", "p_brand")
    assert BG.est_row_bytes(two) > BG.est_row_bytes(one) >= 16


@pytest.mark.parametrize("qname", [
    "q_disjunctive_band_revenue",
    "q_small_quantity_revenue",
    "q_important_parts",
    "q_market_share",
])
def test_gated_tpch_plans_broadcast_the_slice(spark, sf_dir, qname):
    """At test scale every gated slice fits, so each of the four TPC-H
    shapes must show the broadcast in its physical plan — i.e. the fact
    side joins map-side instead of shuffling on the slice key."""
    from compute_histogram_spark import registry

    df = getattr(registry, qname)(spark, sf_dir)
    assert "BroadcastHashJoin" in _plan(df)
