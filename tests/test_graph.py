"""Connected components vs a driver-side union-find twin."""

from pyspark.sql import Row

from compute_histogram_spark.operators import graph as G


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node in component
    comp = {}
    for x in list(parent):
        comp[x] = find(x)
    return comp


def _cc(spark, pairs):
    df = spark.createDataFrame(
        [Row(doc_id_1=a, doc_id_2=b) for a, b in pairs]
    )
    return {
        r["node"]: r["component"] for r in G.connected_components(df).collect()
    }


def test_cc_matches_union_find_on_chain(spark):
    # a long chain forces multiple propagation rounds (diameter > 1)
    pairs = [(i, i + 1) for i in range(0, 12)]
    assert _cc(spark, pairs) == _union_find(pairs)


def test_cc_multiple_components_and_min_labels(spark):
    pairs = [(5, 3), (3, 9), (20, 21), (40, 41), (41, 42), (9, 5)]
    got = _cc(spark, pairs)
    assert got == _union_find(pairs)
    assert got[9] == 3 and got[5] == 3  # min node labels its component
    assert got[21] == 20
    assert got[42] == 40


def test_cc_handles_high_degree_star(spark):
    pairs = [(100, i) for i in range(50)]  # one hub, diameter 2
    got = _cc(spark, pairs)
    assert set(got.values()) == {0}
    assert len(got) == 51


def test_star_cc_matches_simple_cc_and_union_find(spark):
    import random

    rng = random.Random(7)
    nodes = list(range(0, 400, 3))
    pairs = [tuple(sorted(rng.sample(nodes, 2))) for _ in range(150)]
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame([Row(doc_id_1=a, doc_id_2=b) for a, b in pairs])
    star = {r["node"]: r["component"] for r in G.connected_components_star(df).collect()}
    assert star == _union_find(pairs)
    assert star == _cc(spark, pairs)


def test_star_cc_long_chain_converges_in_log_rounds(spark):
    # a 300-link chain has diameter 300: min-label propagation would need
    # ~300 rounds, far beyond max_iter=20 — star-contraction must finish
    # within it (O(log d)) and still produce the exact components
    pairs = [(i, i + 1) for i in range(300)]
    df = spark.createDataFrame([Row(doc_id_1=a, doc_id_2=b) for a, b in pairs])
    got = {r["node"]: r["component"] for r in G.connected_components_star(df, max_iter=20).collect()}
    assert got == {i: 0 for i in range(301)}


def test_star_cc_keeps_self_loop_only_nodes(spark):
    pairs = [(1, 2), (7, 7)]
    df = spark.createDataFrame([Row(doc_id_1=a, doc_id_2=b) for a, b in pairs])
    got = {r["node"]: r["component"] for r in G.connected_components_star(df).collect()}
    assert got == {1: 1, 2: 1, 7: 7}
    # contract parity with the propagation operator
    assert got == {
        r["node"]: r["component"] for r in G.connected_components(df).collect()
    }


def test_cc_empty_edges(spark):
    from pyspark.sql.types import LongType, StructField, StructType

    empty = spark.createDataFrame(
        [], StructType([StructField("doc_id_1", LongType()), StructField("doc_id_2", LongType())])
    )
    assert G.connected_components(empty).count() == 0
    assert G.connected_components_star(empty).count() == 0


# ------------------------------------------------------------- pagerank


def _round_half_up(a, nd=9):
    """Spark/DuckDB round(): HALF_UP away from zero — NOT np.round's
    half-even (same replication as similarity.lsh_buckets_kernel)."""
    import numpy as np

    m = a * (10.0 ** nd)
    return np.where(m >= 0, np.floor(m + 0.5), np.ceil(m - 0.5)) / (10.0 ** nd)


def _numpy_pagerank(edges, iters=10, d=0.85, nd=9):
    """Sequential twin with the operator's exact arithmetic: per-iteration
    HALF_UP rounding, dangling mass dropped."""
    import numpy as np

    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    ow = {}
    for u, _, w in edges:
        ow[u] = ow.get(u, 0.0) + float(w)
    pr = _round_half_up(np.full(n, 1.0 / n), nd)
    base = (1 - d) / n
    for _ in range(iters):
        c = np.zeros(n)
        for u, v, w in edges:
            c[idx[v]] += pr[idx[u]] * (float(w) / ow[u])
        pr = _round_half_up(base + d * c, nd)
    return {v: pr[idx[v]] for v in nodes}


def _synthetic_edges(n_nodes=120, out_deg=4):
    """Deterministic digraph: hash-derived targets and weights."""
    import hashlib

    edges = []
    for u in range(n_nodes):
        for j in range(out_deg):
            h = hashlib.md5(f"{u}:{j}".encode()).hexdigest()
            v = int(h[:6], 16) % n_nodes
            if v != u:
                edges.append((f"n{u:03d}", f"n{v:03d}", int(h[6:8], 16) % 5 + 1))
    return edges


def test_pagerank_matches_numpy_twin(spark):
    edges = _synthetic_edges()
    df = spark.createDataFrame(edges, "src string, dst string, w int")
    got = {
        r["node"]: r["pr"]
        for r in G.pagerank(df, weight="w", iters=10).collect()
    }
    want = _numpy_pagerank(edges)
    assert got.keys() == want.keys()
    assert all(got[k] == want[k] for k in want), {
        k: (got[k], want[k]) for k in want if got[k] != want[k]
    }


def test_pagerank_uniform_cycle_stays_uniform(spark):
    n = 8
    edges = [(f"v{i}", f"v{(i + 1) % n}", 1) for i in range(n)]
    df = spark.createDataFrame(edges, "src string, dst string, w int")
    out = G.pagerank(df, weight="w", iters=5).collect()
    assert {r["pr"] for r in out} == {0.125}


def test_pagerank_sink_attracts_mass(spark):
    # every node points at 'hub'; hub points back at one node
    edges = [(f"v{i}", "hub", 1) for i in range(5)] + [("hub", "v0", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, w int")
    out = {r["node"]: r["pr"] for r in G.pagerank(df, weight="w").collect()}
    # the hub <-> v0 2-cycle trades the mass between them per iteration,
    # so assert the parity-robust property: those two dominate, the
    # leaf nodes sit at the teleport floor (1-d)/N
    assert min(out["hub"], out["v0"]) > 10 * out["v1"]
    assert out["v1"] == out["v2"] == out["v3"] == out["v4"] == 0.025


def test_event_pagerank_oracle_staged(spark, sf_dir):
    """Rotation-ready DuckDB twin (registry.EVENT_PAGERANK_ORACLE):
    fixed-iteration unrolled-CTE power method is value-exact
    cross-engine — staged for the 6th registry rotation."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from check_oracle import compare, duck_connection

    from compute_histogram_spark.registry import (
        EVENT_PAGERANK_ORACLE,
        q_event_pagerank,
    )

    for sf in (sf_dir, "/root/testdata/sf0.01"):
        sdf = q_event_pagerank(spark, sf).toPandas()
        con = duck_connection(sf)
        odf = con.sql(EVENT_PAGERANK_ORACLE).df()
        assert len(sdf) > 0
        assert compare("event_pagerank", sdf, odf) == [], sf


def test_pagerank_empty_edges(spark):
    df = spark.createDataFrame([], "src string, dst string, w int")
    assert G.pagerank(df, weight="w").collect() == []
