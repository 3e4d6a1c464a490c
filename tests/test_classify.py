"""fastText-style hashed linear scorer (operators/classify.py): scoring
arithmetic, the filter gate, and the scale-shape plan."""

from pyspark.sql import Row, functions as F

from compute_histogram_spark.operators import classify as CLS


def _docs(spark):
    return spark.createDataFrame([
        Row(doc_id=1, text="good clean prose with many words here"),
        Row(doc_id=2, text="x"),
        Row(doc_id=3, text="good clean prose with many words here"),
    ])


def test_score_deterministic_and_length_normalized(spark):
    w = CLS.demo_weights(spark)
    out = {r.doc_id: r for r in CLS.linear_text_score(_docs(spark), w).collect()}
    # identical text -> identical score (hash + integer sum, no float order)
    assert out[1].score == out[3].score
    assert out[1].logit_milli == out[3].logit_milli
    # unigrams + bigrams: 7 tokens -> 7 + 6 features
    assert out[1].n_features == 13
    assert out[2].n_features == 1
    for r in out.values():
        assert 0.0 < r.score < 1.0


def test_score_matches_python_twin(spark):
    """Independent pure-Python replication of the full scoring chain."""
    import hashlib
    import math

    text = "alpha beta gamma alpha"
    toks = text.split(" ")
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    n = 4096
    s = 0
    for f in feats:
        b = int(hashlib.md5(f"ft:{f}".encode()).hexdigest()[:8], 16) % n
        s += (b * 2654435761 + 40503) % 1000 - 500
    logit = s / len(feats)
    want = round(1.0 / (1.0 + math.exp(-logit / 1000.0)), 6)
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    got = CLS.linear_text_score(df, CLS.demo_weights(spark)).collect()[0]
    assert got.n_features == len(feats)
    assert got.score == want


def test_score_filter_gate(spark):
    docs = _docs(spark)
    w = CLS.demo_weights(spark)
    scores = {r.doc_id: r.score
              for r in CLS.linear_text_score(docs, w).collect()}
    thr = sorted(scores.values())[1]  # keep the top two
    kept = {r.doc_id for r in CLS.score_filter(docs, w, threshold=thr).collect()}
    assert kept == {d for d, s in scores.items() if s >= thr}


def test_scale_shape_broadcast_weights_no_sort(spark, sf_dir):
    """The weight join must broadcast (bucket-bounded build side) and the
    only exchanges are the feature agg + the presentation sort."""
    from compute_histogram_spark.sources.tables import load

    plan = (
        CLS.linear_text_score(
            load(spark, sf_dir, "documents"), CLS.demo_weights(spark)
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_default_unordered_no_range_exchange(spark, sf_dir):
    """ordered=False default (the url_dedup precedent): neither the
    score table nor the composed score_filter gate may carry a range
    exchange — plan-asserted, not left to EliminateSorts."""
    from compute_histogram_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    w = CLS.demo_weights(spark)
    for df in (
        CLS.linear_text_score(docs, w),
        CLS.score_filter(docs, w, threshold=0.5),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "rangepartitioning" not in plan.lower(), plan


def test_sparse_weights_keep_denominator(spark):
    """Missing buckets are zero-weight features, not dropped ones: a
    sparse trained table must not shrink n_features (ADVICE r11)."""
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta gamma alpha")]
    )
    empty_w = spark.range(0).select(
        F.col("id").cast("int").alias("bucket"),
        F.col("id").alias("w_milli"),
    )
    got = CLS.linear_text_score(docs, empty_w).collect()[0]
    # 4 unigrams + 3 bigrams, all unmatched -> logit 0, score 0.5
    assert got.n_features == 7
    assert got.logit_milli == 0.0
    assert got.score == 0.5
