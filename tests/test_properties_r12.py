"""Property-based invariants for the r12 operators: structural truths
that must hold on ANY input — normalization idempotency, triangle
counts vs brute force, Bloom's no-false-negative guarantee, and
duplicate-span coverage conservation."""

import hashlib
import itertools
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

# small token alphabet makes collisions/duplication LIKELY (the
# interesting regime for dedup ops)
token = st.sampled_from(["aa", "Bb", "c,c", "DD!", "e"])
text = st.lists(token, min_size=0, max_size=12).map(" ".join)


_S = dict(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])


@settings(**_S)
@given(texts=st.lists(text, min_size=1, max_size=6))
def test_normalize_text_idempotent_and_charset(spark, texts):
    """normalize(normalize(x)) == normalize(x), and the output alphabet
    is exactly [a-z0-9 ] with no double spaces or edge spaces."""
    from pyspark.sql import functions as F

    from compute_histogram_spark.operators.dedup import normalize_text

    df = spark.createDataFrame(
        [Row(i=i, t=t) for i, t in enumerate(texts)], "i long, t string"
    )
    out = df.select(
        "i",
        normalize_text("t").alias("n1"),
        normalize_text(normalize_text("t")).alias("n2"),
    ).collect()
    for r in out:
        assert r.n1 == r.n2
        assert re.fullmatch(r"[a-z0-9 ]*", r.n1)
        assert "  " not in r.n1
        assert r.n1 == r.n1.strip()


@settings(**_S)
@given(edges=st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)), min_size=0, max_size=16
))
def test_triangle_count_matches_brute_force(spark, edges):
    """Degree-oriented count == brute-force enumeration on any small
    graph (self-loops and duplicate/reversed edges included)."""
    from compute_histogram_spark.operators.graph import triangle_count

    simple = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({n for e in simple for n in e})
    brute = sum(
        1 for x, y, z in itertools.combinations(nodes, 3)
        if (x, y) in simple and (y, z) in simple and (x, z) in simple
    )
    df = spark.createDataFrame(
        [Row(a=a, b=b) for a, b in edges] or [Row(a=0, b=0)],
        "a long, b long",
    )
    got = triangle_count(df).collect()[0].n_triangles
    assert got == brute


@settings(**_S)
@given(vals=st.lists(st.text(min_size=1, max_size=6), min_size=1, max_size=30))
def test_bloom_never_false_negative(spark, vals):
    """EVERY inserted value must test member=true, for any value set."""
    from compute_histogram_spark.operators.sketches import (
        bloom_contains,
        bloom_word_table_portable,
    )

    df = spark.createDataFrame([Row(v=v) for v in vals], "v string")
    bloom = bloom_word_table_portable(df, "v", m_bits=1024, k=3)
    out = bloom_contains(df, bloom, "v", m_bits=1024, k=3).collect()
    assert all(r.member for r in out)
    assert len(out) == len(set(vals))


@settings(**_S)
@given(texts=st.lists(
    st.lists(st.sampled_from("abcde"), min_size=1, max_size=25)
    .map(lambda ts: " ".join(ts)),
    min_size=1, max_size=5,
))
def test_dup_span_removal_conserves_tokens(spark, texts):
    """n_tokens == kept + removed per doc; kept text token count matches;
    docs shorter than the window are never touched."""
    from compute_histogram_spark.operators.dedup import (
        duplicate_span_removal,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    out = duplicate_span_removal(df, min_len=4).collect()
    by_id = {r.doc_id: r for r in out}
    for i, t in enumerate(texts):
        n = len(t.split(" "))
        if i in by_id:
            r = by_id[i]
            assert r.n_tokens == n
            assert len(r.text.split(" ")) == n - r.n_removed
            if n < 4:
                assert r.n_removed == 0 and r.text == t
        else:
            # fully removed: only possible when the doc had >= 4 tokens
            assert n >= 4
