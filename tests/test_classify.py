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


# ---------------------------------------------------------------------------
# Distributed logistic training (r12, VERDICT r11 #3)
# ---------------------------------------------------------------------------


def _labeled_docs(spark, sf_dir):
    """documents with a TEXT-DERIVED binary label: y = 1 iff the doc has
    at least as many 'join' tokens as 'scan' tokens — linearly learnable
    by the mean-of-hashed-weights model (weight mass on the two buckets),
    unlike the corpus's lang column whose token distribution is
    label-independent by construction."""
    from compute_histogram_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    cnt = lambda t: F.size(F.filter(F.split("text", " "), lambda x: x == F.lit(t)))  # noqa: E731
    return docs.withColumn(
        "label", (cnt("join") >= cnt("scan")).cast("int")
    )


def test_train_logistic_matches_numpy_twin(spark):
    """Exact replication: the distributed trainer's weights after 3
    epochs equal a pure-Python/NumPy reimplementation of the same
    integer-quantized arithmetic on the same tiny corpus."""
    import hashlib
    import math

    corpus = [
        (1, "good clean prose join join table", 1),
        (2, "scan scan slow bad noise", 0),
        (3, "join value join fast", 1),
        (4, "scan junk scan scan", 0),
        (5, "join scan mixed join words here", 1),
    ]
    n_buckets, epochs, damping = 64, 3, 0.8
    df = spark.createDataFrame(corpus, "doc_id long, text string, label int")
    w_df, bias, hist = CLS.train_logistic(
        df, n_buckets=n_buckets, epochs=epochs, damping=damping
    )
    got = {r.bucket: r.w_milli for r in w_df.collect()}

    # --- independent twin -------------------------------------------------
    def buckets(text):
        toks = text.split(" ")
        feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return [
            int(hashlib.md5(f"ft:{f}".encode()).hexdigest()[:8], 16)
            % n_buckets
            for f in feats
        ]

    from collections import Counter

    docs = [(d, buckets(t), y) for d, t, y in corpus]
    w = [0] * n_buckets
    b_milli = 0
    losses = []
    for _ in range(epochs):
        grad = [0] * n_buckets
        hess = [0] * n_buckets
        ge = he = ls = 0
        for _d, bs, y in docs:
            n = len(bs)
            s = sum(w[x] for x in bs)
            logit = (s / n + b_milli) / 1000.0
            p = 1.0 / (1.0 + math.exp(-logit))
            p = min(1.0 - 1e-9, max(1e-9, p))
            em = round((p - y) * 1e6)
            hm = round(p * (1.0 - p) * 1e6)
            ls += round(-(y * math.log(p) + (1 - y) * math.log(1 - p)) * 1e6)
            ge += em
            he += hm
            for x, c in Counter(bs).items():
                grad[x] += round(em * c / n)
                hess[x] += round(hm * c / n)
        losses.append(ls / 1e6 / len(docs))
        for x in range(n_buckets):
            w[x] -= round(damping * 1000.0 * grad[x] / (hess[x] + 1))
        b_milli -= round(damping * 1000.0 * ge / (he + 1))

    assert bias == b_milli
    assert [round(h, 6) for h in hist] == [round(h, 6) for h in losses]
    for x in range(n_buckets):
        assert got[x] == w[x], (x, got[x], w[x])


def test_train_logistic_loss_decreases_and_separates_holdout(spark, sf_dir):
    """The full stage on the driver's documents table: loss falls
    monotonically-ish, and the trained model separates a disjoint
    holdout (mean score gap + pairwise ranking accuracy)."""
    from compute_histogram_spark.operators.pipeline import split_assign

    labeled = _labeled_docs(spark, sf_dir)
    s = split_assign(labeled)
    train = s.where(F.col("split") == "train").select("doc_id", "text", "label")
    hold = s.where(F.col("split") != "train").select("doc_id", "text", "label")

    w, bias, hist = CLS.train_logistic(train, epochs=20)
    assert len(hist) == 20
    assert all(b < a for a, b in zip(hist, hist[1:])), hist  # monotone (MM)
    assert hist[-1] < hist[0] * 0.5, hist  # loss at least halved

    scores = CLS.linear_text_score(hold, w, bias_milli=bias).join(
        hold.select("doc_id", "label"), "doc_id"
    ).select("label", "score").collect()
    pos = sorted(r.score for r in scores if r.label == 1)
    neg = sorted(r.score for r in scores if r.label == 0)
    assert pos and neg
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    assert mean(pos) > mean(neg) + 0.1, (mean(pos), mean(neg))
    # pairwise ranking accuracy (AUC by direct count; holdout is small)
    wins = sum(1 for p in pos for n in neg if p > n) + 0.5 * sum(
        1 for p in pos for n in neg if p == n
    )
    auc = wins / (len(pos) * len(neg))
    assert auc > 0.8, auc


def test_score_filter_e2e_on_trained_weights(spark, sf_dir):
    """The pipeline gate runs end-to-end on TRAINED weights: the kept
    set retains most positives and is enriched in them vs the corpus."""
    labeled = _labeled_docs(spark, sf_dir)
    w, bias, _ = CLS.train_logistic(labeled, epochs=20)
    kept = CLS.score_filter(
        labeled.select("doc_id", "text"), w, threshold=0.5
    )
    kept_labels = kept.join(
        labeled.select("doc_id", "label"), "doc_id"
    ).groupBy("label").count().collect()
    by = {r.label: r["count"] for r in kept_labels}
    total_pos = labeled.where("label = 1").count()
    total = labeled.count()
    n_kept = by.get(0, 0) + by.get(1, 0)
    assert by.get(1, 0) > 0.7 * total_pos  # keeps most positives
    # enrichment: positive fraction among kept beats the base rate
    assert by.get(1, 0) / n_kept > total_pos / total + 0.08
