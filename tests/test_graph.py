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
