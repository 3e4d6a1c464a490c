"""Property-based invariants for the r16 wave-13 operators: exact
rank-selection quantiles must agree with numpy's inverted-CDF method on
ANY multiset (ties, skew, singleton groups), and skip-gram counts must
equal a brute-force Python twin on ANY token sequence."""

import collections

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

_S = dict(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])

# heavy-tie regime on purpose: a tiny value domain makes every quantile
# land on or next to a tie run, the failure mode interpolation-based
# implementations get wrong
lengths = st.lists(st.integers(0, 9), min_size=1, max_size=20)


@settings(**_S)
@given(data=st.dictionaries(
    st.sampled_from(["en", "de", "fr"]), lengths, min_size=1, max_size=3
))
def test_doc_length_quantiles_matches_numpy_inverted_cdf(spark, data):
    """idx = ceil(p*n) rank selection == numpy percentile with
    method='inverted_cdf' (the exact, non-interpolating definition) for
    every group and every percentile in the spine."""
    from compute_histogram_spark.operators.text import doc_length_quantiles

    rows = [Row(lang=g, n_chars=v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "lang string, n_chars int")
    got = {(r.lang, r.pct): (r.n_docs, r.q_len)
           for r in doc_length_quantiles(df).collect()}
    for g, vs in data.items():
        arr = np.sort(np.array(vs))
        for pct in (25, 50, 75, 90):
            want = int(np.percentile(arr, pct, method="inverted_cdf"))
            assert got[(g, pct)] == (len(vs), want), (g, pct, vs)
    # exactly |groups| x |spine| output rows — never data-scaled
    assert len(got) == 4 * len(data)


@settings(**_S)
@given(docs=st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=8),
    min_size=1, max_size=5,
), window=st.integers(1, 3))
def test_skipgram_pairs_matches_brute_force(spark, docs, window):
    """Pair counts == brute-force (i, i+d) enumeration for d in
    1..window on any corpus, incl. empty and single-token docs."""
    from compute_histogram_spark.operators.text import skipgram_pairs

    brute = collections.Counter()
    for toks in docs:
        for d in range(1, window + 1):
            for i in range(len(toks) - d):
                brute[(toks[i], toks[i + d])] += 1
    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(t)) for i, t in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {(r.a, r.b): r.n_pairs
           for r in skipgram_pairs(
               df, window=window, min_count=1, k=1000).collect()}
    # NOTE: "" splits to [''] (one empty token) under the single-space
    # convention, so an empty doc yields no pairs only because size 1 < 2
    brute = {k: v for k, v in brute.items() if v >= 1}
    assert got == dict(brute)
