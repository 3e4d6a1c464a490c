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


def _two_docs(spark, ids_and_texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, uri=f"http://x.example/{i}")
         for i, t in ids_and_texts]
    )


_T1 = ("a long enough first document about the calibration of orbital "
       "spectrometers during quiet tuesday afternoon maintenance shifts")
_T2 = ("a second, unrelated long document on the economics of medieval "
       "salt trading routes across the western alpine mountain passes")
_T3 = ("a third document describing the migratory patterns of arctic "
       "terns and the surveying instruments used to follow them at night")
_T4 = ("a fourth document on the statistical properties of rolling-hash "
       "document fingerprints under adversarial token substitutions")


def test_crash_mid_publish_recovers_exactly_once(spark, state, monkeypatch):
    """The ADVICE r14 window: corpus part-files published, blocking
    digests NOT yet in keys/, process dies. The retry must (a) finish
    the committed publish at entry and (b) append nothing again —
    exactly-once, no duplicate corpus rows, no unguarded digests."""
    import glob
    import os

    w = demo_weights(spark)
    b1_out = PL.incremental_corpus_ingest(
        _two_docs(spark, [(1, _T1), (2, _T2)]), state, w
    )
    ids1 = {r["doc_id"] for r in b1_out.select("doc_id").collect()}
    b2 = _two_docs(spark, [(10, _T3), (11, _T4)])

    def half_publish(state_dir, tag):
        stage = os.path.join(state_dir, "staging", tag)
        dst = os.path.join(state_dir, "corpus")
        os.makedirs(dst, exist_ok=True)
        for f in sorted(glob.glob(os.path.join(stage, "corpus", "part-*"))):
            os.rename(f, os.path.join(dst, f"{tag}-{os.path.basename(f)}"))
        raise RuntimeError("simulated crash mid-publish")

    monkeypatch.setattr(PL, "_publish_staged", half_publish)
    with pytest.raises(RuntimeError, match="simulated crash"):
        PL.incremental_corpus_ingest(b2, state, w)
    monkeypatch.undo()

    # the half-published state is live on disk: corpus has batch-2 rows,
    # keys does not have their digests yet
    assert len(glob.glob(os.path.join(state, "staging", "*"))) == 1

    retry = PL.incremental_corpus_ingest(b2, state, w)
    assert retry.count() == 0  # marker says committed; nothing re-appended
    corpus = spark.read.parquet(state + "/corpus")
    assert corpus.count() == corpus.dropDuplicates(["doc_id"]).count()
    assert {r["doc_id"] for r in corpus.select("doc_id").collect()} == (
        ids1 | {10, 11}
    )
    keys = spark.read.parquet(state + "/keys")
    assert keys.count() == keys.distinct().count()
    assert glob.glob(os.path.join(state, "staging", "*")) == []  # drained
    # batch-2 digests now block future copies (the hazard being fixed)
    copy = _two_docs(spark, [(20, _T3)])
    assert PL.incremental_corpus_ingest(copy, state, w).count() == 0


def test_uncommitted_staging_is_discarded(spark, state):
    """A staged batch with NO commit marker never happened: entry
    discards it instead of publishing garbage."""
    import os

    w = demo_weights(spark)
    # _T2/_T3 both clear the quality gate (_T1 scores 0.4967 < 0.5)
    PL.incremental_corpus_ingest(_two_docs(spark, [(1, _T2)]), state, w)
    junk = os.path.join(state, "staging", "deadbeefdeadbeef")
    os.makedirs(os.path.join(junk, "corpus"))
    with open(os.path.join(junk, "corpus", "part-bogus"), "w") as fh:
        fh.write("not parquet")
    out = PL.incremental_corpus_ingest(_two_docs(spark, [(2, _T3)]),
                                       state, w)
    assert out.count() == 1
    assert not os.path.exists(junk)
    assert spark.read.parquet(state + "/corpus").count() == 2


def test_snapshot_reads_reconstruct_every_commit(spark, state):
    """read_corpus_as_of(seq) == the corpus exactly as it stood after
    commit seq, for every commit — time travel by file-list pruning
    over the tag-prefixed append-only parts (r16)."""
    w = demo_weights(spark)
    batches = [[(1, _T2)], [(10, _T3)], [(20, _T4)]]
    after = []  # corpus doc_id set observed right after each commit
    for b in batches:
        PL.incremental_corpus_ingest(_two_docs(spark, b), state, w)
        after.append({r["doc_id"] for r in
                      spark.read.parquet(state + "/corpus").collect()})
    snaps = PL.corpus_snapshots(state)
    assert [s["seq"] for s in snaps] == [1, 2, 3]
    for seq, want in zip([1, 2, 3], after):
        got = {r["doc_id"] for r in
               PL.read_corpus_as_of(spark, state, seq).collect()}
        assert got == want, seq
    # latest (None) == last commit == full table read
    latest = {r["doc_id"] for r in
              PL.read_corpus_as_of(spark, state).collect()}
    assert latest == after[-1]


def test_snapshot_retry_assigns_no_new_seq(spark, state):
    """Re-ingesting a committed batch is a no-op in the commit log too:
    the snapshot history gains no entry and existing seqs are stable."""
    w = demo_weights(spark)
    b = _two_docs(spark, [(1, _T2)])
    PL.incremental_corpus_ingest(b, state, w)
    log1 = PL.corpus_snapshots(state)
    PL.incremental_corpus_ingest(b, state, w)  # idempotent retry
    assert PL.corpus_snapshots(state) == log1
    PL.incremental_corpus_ingest(_two_docs(spark, [(2, _T3)]), state, w)
    log2 = PL.corpus_snapshots(state)
    assert log2[: len(log1)] == log1 and log2[-1]["seq"] == 2


def test_snapshot_never_observes_a_torn_commit(spark, state, monkeypatch):
    """An as-of read entered against a committed-but-half-published
    state finishes the publish first (the ingest's own recovery), so a
    snapshot can never return a commit's partial row set; and an
    UNcommitted staged batch is invisible at every seq."""
    import glob
    import os

    w = demo_weights(spark)
    PL.incremental_corpus_ingest(_two_docs(spark, [(1, _T2)]), state, w)
    b2 = _two_docs(spark, [(10, _T3), (11, _T4)])

    def no_publish(state_dir, tag):
        raise RuntimeError("simulated crash before publish")

    monkeypatch.setattr(PL, "_publish_staged", no_publish)
    with pytest.raises(RuntimeError, match="simulated crash"):
        PL.incremental_corpus_ingest(b2, state, w)
    monkeypatch.undo()

    # marker exists, parts still in staging: the snapshot read must
    # surface the COMPLETE batch-2 commit (recovery publishes it)
    assert glob.glob(os.path.join(state, "staging", "*"))
    got = {r["doc_id"] for r in
           PL.read_corpus_as_of(spark, state, 2).collect()}
    assert got == {1, 10, 11}
    assert glob.glob(os.path.join(state, "staging", "*")) == []
    # seq 1 stays historically exact after the recovery
    assert {r["doc_id"] for r in
            PL.read_corpus_as_of(spark, state, 1).collect()} == {1}


def test_snapshot_legacy_tagonly_markers_still_order(spark, state):
    """A state dir whose markers predate the seq format (body == tag)
    keeps a total commit order by mtime, and the next writer continues
    ABOVE it — mixed histories read correctly."""
    import os

    w = demo_weights(spark)
    PL.incremental_corpus_ingest(_two_docs(spark, [(1, _T2)]), state, w)
    # rewrite the marker to the legacy format (content == filename)
    commits = os.path.join(state, "_commits")
    (tag,) = os.listdir(commits)
    with open(os.path.join(commits, tag), "w") as fh:
        fh.write(tag)
    assert PL.corpus_snapshots(state) == [{"seq": 1, "tag": tag}]
    PL.incremental_corpus_ingest(_two_docs(spark, [(2, _T3)]), state, w)
    snaps = PL.corpus_snapshots(state)
    assert [s["seq"] for s in snaps] == [1, 2] and snaps[0]["tag"] == tag
    assert {r["doc_id"] for r in
            PL.read_corpus_as_of(spark, state, 1).collect()} == {1}


def test_compaction_preserves_snapshots_at_and_above_horizon(spark, state):
    """compact_corpus_state folds every commit <= horizon into one
    coalesced part set: reads at/above the horizon stay EXACT, file
    count drops, and history below the horizon raises (the vacuum
    trade, stated in the API)."""
    import glob
    import os

    w = demo_weights(spark)
    for b in [[(1, _T2)], [(10, _T3)], [(20, _T4)]]:
        PL.incremental_corpus_ingest(_two_docs(spark, b), state, w)
    before_2 = {r["doc_id"] for r in
                PL.read_corpus_as_of(spark, state, 2).collect()}
    before_3 = {r["doc_id"] for r in
                PL.read_corpus_as_of(spark, state, 3).collect()}
    n_files = len(glob.glob(os.path.join(state, "corpus", "*-part-*")))

    res = PL.compact_corpus_state(spark, state, up_to_seq=2)
    # one coalesced file per state table (corpus, keys, sigs)
    assert res["horizon"] == 2 and res["n_files_after"] == 3
    files = glob.glob(os.path.join(state, "corpus", "*-part-*"))
    assert len(files) < n_files
    # exactness at and above the horizon
    assert {r["doc_id"] for r in
            PL.read_corpus_as_of(spark, state, 2).collect()} == before_2
    assert {r["doc_id"] for r in
            PL.read_corpus_as_of(spark, state, 3).collect()} == before_3
    assert {r["doc_id"] for r in
            PL.read_corpus_as_of(spark, state).collect()} == before_3
    # full-directory reads see no duplicates after the vacuum
    corpus = spark.read.parquet(state + "/corpus")
    assert corpus.count() == corpus.dropDuplicates(["doc_id"]).count()
    # granularity below the horizon is gone
    with pytest.raises(ValueError, match="compaction horizon"):
        PL.read_corpus_as_of(spark, state, 1)
    # a horizon that does not advance is rejected
    with pytest.raises(ValueError, match="does not advance"):
        PL.compact_corpus_state(spark, state, up_to_seq=2)


def test_recompaction_folds_previous_compact_set(spark, state):
    """A later compaction absorbs the previous cp set plus the newer
    tags; commits keep flowing afterwards with correct sequences."""
    import glob
    import os

    w = demo_weights(spark)
    for b in [[(1, _T2)], [(10, _T3)]]:
        PL.incremental_corpus_ingest(_two_docs(spark, b), state, w)
    PL.compact_corpus_state(spark, state)  # horizon 2
    PL.incremental_corpus_ingest(_two_docs(spark, [(20, _T4)]), state, w)
    assert [s["seq"] for s in PL.corpus_snapshots(state)] == [1, 2, 3]
    res = PL.compact_corpus_state(spark, state)  # horizon 3 folds cp2
    assert res["horizon"] == 3
    parts = glob.glob(os.path.join(state, "corpus", "*-part-*"))
    assert len(parts) == 1 and os.path.basename(parts[0]).startswith("cp3-")
    assert {r["doc_id"] for r in
            PL.read_corpus_as_of(spark, state).collect()} == {1, 10, 20}


def test_compaction_crash_after_manifest_recovers(spark, state, monkeypatch):
    """The manifest is the commit point: crash after it lands (parts
    still staged, nothing vacuumed) and the next snapshot read must
    finish the publish + vacuum and return exact results."""
    import glob
    import os

    w = demo_weights(spark)
    for b in [[(1, _T2)], [(10, _T3)]]:
        PL.incremental_corpus_ingest(_two_docs(spark, b), state, w)
    want = {r["doc_id"] for r in
            PL.read_corpus_as_of(spark, state).collect()}

    def no_publish(state_dir, prefix):
        raise RuntimeError("simulated crash after manifest")

    monkeypatch.setattr(PL, "_publish_compaction", no_publish)
    with pytest.raises(RuntimeError, match="simulated crash"):
        PL.compact_corpus_state(spark, state)
    monkeypatch.undo()

    # committed manifest + staged parts + un-vacuumed old files on disk
    assert PL._compaction_manifest(state) is not None
    assert glob.glob(os.path.join(state, "staging", "compact-*"))
    got = {r["doc_id"] for r in
           PL.read_corpus_as_of(spark, state).collect()}
    assert got == want
    # recovery drained staging, published cp parts, vacuumed the rest
    assert glob.glob(os.path.join(state, "staging", "compact-*")) == []
    parts = glob.glob(os.path.join(state, "corpus", "*-part-*"))
    assert all(os.path.basename(p).startswith("cp2-") for p in parts)
    corpus = spark.read.parquet(state + "/corpus")
    assert corpus.count() == corpus.dropDuplicates(["doc_id"]).count()


def test_ingest_continues_correctly_after_state_compaction(spark, state):
    """Compaction folds keys/ and sigs/ too (every future batch reads
    both indexes — their file count taxes every O(delta) job). The
    compacted indexes must keep blocking: a re-arriving text dedupes,
    a fresh batch ingests, and the commit log keeps counting."""
    import glob
    import os

    w = demo_weights(spark)
    for b in [[(1, _T2)], [(10, _T3)]]:
        PL.incremental_corpus_ingest(_two_docs(spark, b), state, w)
    res = PL.compact_corpus_state(spark, state)
    # all three tables hold exactly the compact set now
    for t in ("corpus", "keys", "sigs"):
        parts = glob.glob(os.path.join(state, t, "*-part-*"))
        assert parts and all(
            os.path.basename(p).startswith("cp2-") for p in parts
        ), t
    # the compacted keys still block an exact re-arrival under a new id
    assert PL.incremental_corpus_ingest(
        _two_docs(spark, [(30, _T3)]), state, w
    ).count() == 0
    # and a genuinely new batch still lands with the next sequence
    out = PL.incremental_corpus_ingest(_two_docs(spark, [(40, _T4)]),
                                       state, w)
    assert out.count() == 1
    assert [s["seq"] for s in PL.corpus_snapshots(state)] == [1, 2, 3, 4]
    assert {r["doc_id"] for r in
            PL.read_corpus_as_of(spark, state).collect()} == {1, 10, 40}
    keys = spark.read.parquet(state + "/keys")
    assert keys.count() == keys.distinct().count()


def test_snapshot_diff_is_the_commit_delta(spark, state):
    """diff(a, b) returns exactly the rows added by commits a+1..b, and
    as_of(a) + diff(a, b) == as_of(b) — the incremental-consumer
    identity, by file-list pruning (never an anti-join)."""
    w = demo_weights(spark)
    for b in [[(1, _T2)], [(10, _T3)], [(20, _T4)]]:
        PL.incremental_corpus_ingest(_two_docs(spark, b), state, w)

    def ids(df):
        return {r["doc_id"] for r in df.collect()}

    a1 = ids(PL.read_corpus_as_of(spark, state, 1))
    a3 = ids(PL.read_corpus_as_of(spark, state, 3))
    d13 = ids(PL.corpus_snapshot_diff(spark, state, 1, 3))
    assert a1 | d13 == a3 and not (a1 & d13)
    # None == latest; from genesis == the full corpus
    assert ids(PL.corpus_snapshot_diff(spark, state, 1)) == d13
    assert ids(PL.corpus_snapshot_diff(spark, state, 0)) == a3
    # empty delta is a valid empty frame with the corpus schema
    empty = PL.corpus_snapshot_diff(spark, state, 3, 3)
    assert empty.count() == 0 and "doc_id" in empty.columns


def test_snapshot_diff_range_validation(spark, state):
    """Bad ranges fail loudly: base beyond latest, inverted ranges, and
    bases below the compaction horizon (granularity vacuumed)."""
    import pytest as _pytest

    w = demo_weights(spark)
    for b in [[(1, _T2)], [(10, _T3)], [(20, _T4)]]:
        PL.incremental_corpus_ingest(_two_docs(spark, b), state, w)
    with _pytest.raises(ValueError, match="invalid diff range"):
        PL.corpus_snapshot_diff(spark, state, 4)
    with _pytest.raises(ValueError, match="invalid diff range"):
        PL.corpus_snapshot_diff(spark, state, 2, 1)
    PL.compact_corpus_state(spark, state, up_to_seq=2)
    with _pytest.raises(ValueError, match="compaction horizon"):
        PL.corpus_snapshot_diff(spark, state, 1, 3)
    # at/above the horizon the diff stays exact across the compact set
    d23 = {r["doc_id"] for r in
           PL.corpus_snapshot_diff(spark, state, 2, 3).collect()}
    a2 = {r["doc_id"] for r in
          PL.read_corpus_as_of(spark, state, 2).collect()}
    a3 = {r["doc_id"] for r in
          PL.read_corpus_as_of(spark, state, 3).collect()}
    assert a2 | d23 == a3 and not (a2 & d23)


def test_diff_feeds_incremental_index_maintenance(spark, state, tmp_path):
    """The consumer loop the diff API exists for: after every commit,
    append only diff(last_seen, latest) signatures to a MinHash index
    (dedup.append_minhash_index) — the index stays identical to a full
    rebuild over as_of(latest), at O(delta) cost per commit."""
    from compute_histogram_spark.operators import dedup as DD

    w = demo_weights(spark)
    idx = str(tmp_path / "sig_index")
    last = 0
    for b in [[(1, _T2)], [(10, _T3)], [(20, _T4)]]:
        PL.incremental_corpus_ingest(_two_docs(spark, b), state, w)
        latest = PL.corpus_snapshots(state)[-1]["seq"]
        delta = PL.corpus_snapshot_diff(spark, state, last, latest)
        DD.append_minhash_index(delta.select("doc_id", "text"), idx)
        last = latest
    full = DD.minhash_signatures(DD.shingle_table(
        PL.read_corpus_as_of(spark, state).select("doc_id", "text"),
        distinct=False,
    ))
    inc = spark.read.parquet(idx)
    assert sorted(map(tuple, inc.collect())) == \
        sorted(map(tuple, full.collect()))
