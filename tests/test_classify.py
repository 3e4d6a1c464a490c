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
