"""Deterministic persist lifecycle (r17, VERDICT r16 #3).

Operators that persist per-run intermediates must not leak cache blocks
past their last consumer in a long-lived session: boundaries that stop
being referenced mid-build are unpersisted eagerly, and frames the
returned plan still depends on are tagged via
``session.defer_release`` so the caller (bench.materialize,
check_oracle, these tests) frees them right after its action.

The pin reads Spark's authoritative persistent-RDD map, counting the
NAMED entries — CacheManager-persisted InMemoryRelations carry their
plan string as the RDD name, while ``localCheckpoint`` iteration frames
(connected components, BPE rounds — superseded each round and reclaimed
by the ContextCleaner, the documented iterative idiom) are unnamed. The
session fixture may carry unrelated cached frames, so the tests assert
the delta, not an absolute zero.
"""

from __future__ import annotations

from compute_histogram_spark.session import defer_release, release_persists


def _n_cached(spark) -> int:
    """Named persistent RDDs = CacheManager-managed persisted frames."""
    jm = spark.sparkContext._jsc.getPersistentRDDs()
    it, n = jm.entrySet().iterator(), 0
    while it.hasNext():
        if it.next().getValue().name() is not None:
            n += 1
    return n


def _preclear(spark, builder):
    """Evaluate + release once so a stale identical-plan cache left by an
    earlier test in the session (CacheManager dedupes by logical plan —
    'Asked to cache already cached data') cannot skew the delta below."""
    df = builder()
    df.collect()
    release_persists(df)


def test_defer_release_tags_and_releases(spark):
    df = spark.range(10).persist()
    df.count()  # register the cache (persist alone is lazy)
    out = defer_release(spark.range(5), df)
    assert out._graft_persists == (df,)
    before = _n_cached(spark)
    assert release_persists(out) == 1
    assert out._graft_persists == ()
    assert _n_cached(spark) == before - 1


def test_end_to_end_corpus_releases_all_boundaries(spark, sf_dir):
    """The corpus chain's eager stage loop frees d1/d2 during the build
    (only the LAST boundary outlives the builder call) and tags d3 for
    the caller: after the action + release, zero residual persists."""
    from compute_histogram_spark.registry import q_end_to_end_corpus

    _preclear(spark, lambda: q_end_to_end_corpus(spark, sf_dir))
    before = _n_cached(spark)
    df = q_end_to_end_corpus(spark, sf_dir)
    # mid-flight: exactly one boundary (d3) is cached, not three
    assert _n_cached(spark) == before + 1
    df.collect()
    assert release_persists(df) >= 1
    assert _n_cached(spark) == before


def test_q5_plain_releases_cached_slice(spark, sf_dir):
    from compute_histogram_spark.registry import q_local_supplier_revenue

    _preclear(spark, lambda: q_local_supplier_revenue(spark, sf_dir))
    before = _n_cached(spark)
    df = q_local_supplier_revenue(spark, sf_dir)
    df.collect()
    release_persists(df)
    assert _n_cached(spark) == before


def test_dedup_triangles_releases_edge_frames(spark, sf_dir):
    from compute_histogram_spark.registry import q_dedup_triangles

    _preclear(spark, lambda: q_dedup_triangles(spark, sf_dir))
    before = _n_cached(spark)
    df = q_dedup_triangles(spark, sf_dir)
    df.collect()
    assert release_persists(df) == 2  # e + oriented
    assert _n_cached(spark) == before


def test_dsir_weights_releases_bounded_cache(spark, sf_dir):
    from compute_histogram_spark.registry import q_dsir_weights

    _preclear(spark, lambda: q_dsir_weights(spark, sf_dir))
    before = _n_cached(spark)
    df = q_dsir_weights(spark, sf_dir)
    df.collect()
    assert release_persists(df) == 1  # the n_buckets LLR join table
    assert _n_cached(spark) == before


def test_corpus_overlap_kmv_releases_sketches(spark, sf_dir):
    from compute_histogram_spark.registry import q_corpus_overlap_kmv

    _preclear(spark, lambda: q_corpus_overlap_kmv(spark, sf_dir))
    before = _n_cached(spark)
    df = q_corpus_overlap_kmv(spark, sf_dir)
    df.collect()
    assert release_persists(df) == 3  # ska + skb + u
    assert _n_cached(spark) == before
