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
