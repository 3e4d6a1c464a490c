import pytest
from pyspark.sql import Row, functions as F

from compute_histogram_spark.operators import sketches as SK
from compute_histogram_spark.operators import text as TX
from compute_histogram_spark.sources.tables import load


def _true_counts(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return {
        r["token"]: r["n"]
        for r in docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def test_cms_never_undercounts(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    truth = _true_counts(spark, sf_dir)
    n_stream = sum(truth.values())
    sketch = SK.cms_build_tokens(docs)
    cands = docs.select(F.explode(F.split("text", " ")).alias("token")).distinct()
    est = {r["token"]: r["est"] for r in SK.cms_estimate(sketch, cands).collect()}
    assert est.keys() == truth.keys()
    eps_bound = (2.0 / SK.WIDTH) * n_stream  # CMS overestimate bound per query
    for tok, true_n in truth.items():
        assert est[tok] >= true_n, tok  # structural guarantee, always
        assert est[tok] - true_n <= max(1, eps_bound), tok


def test_cms_sketch_is_bounded(spark, sf_dir):
    sketch = SK.cms_build_tokens(load(spark, sf_dir, "documents"))
    assert sketch.count() <= SK.DEPTH * SK.WIDTH
    # exactly DEPTH rows of buckets, each cell's count positive
    rows = sketch.groupBy("r").agg(F.sum("cnt").alias("s")).collect()
    stream = [r["s"] for r in rows]
    assert len(stream) == SK.DEPTH
    # each hash row sees the whole stream once
    assert len(set(stream)) == 1


def test_cms_merge_linearity(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)
    merged = SK.cms_merge(SK.cms_build_tokens(a), SK.cms_build_tokens(b))
    full = SK.cms_build_tokens(docs)
    # cell-wise identical sketches
    diff = (
        merged.withColumnRenamed("cnt", "m")
        .join(full.withColumnRenamed("cnt", "f"), ["r", "b"], "full_outer")
        .where(
            ~F.col("m").eqNullSafe(F.col("f"))
        )
    )
    assert diff.count() == 0


def test_cms_heavy_hitters_match_exact_topk(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    truth = _true_counts(spark, sf_dir)
    thresh = sorted(truth.values(), reverse=True)[min(10, len(truth)) - 1]
    hh = SK.cms_heavy_hitters(docs, min_count=thresh)
    got = {r["token"] for r in hh.collect()}
    should = {t for t, n in truth.items() if n >= thresh}
    # no false negatives, structurally; no false positives at this width
    assert should <= got
    extra = got - should
    assert all(truth[t] >= thresh - (2.0 / SK.WIDTH) * sum(truth.values()) for t in extra)


def test_cms_empty_candidate_bucket_is_zero(spark):
    vals = spark.createDataFrame([Row(token="a")] * 5 + [Row(token="b")] * 3)
    sketch = SK.cms_build(vals)
    cands = spark.createDataFrame([Row(token="a"), Row(token="zzz-unseen")])
    est = {r["token"]: r["est"] for r in SK.cms_estimate(sketch, cands).collect()}
    assert est["a"] == 5
    assert est["zzz-unseen"] == 0


def test_kmv_exact_when_small(spark):
    """Fewer distincts than k -> sketch IS the domain, estimate exact."""
    df = spark.range(100).select((F.col("id") % 37).alias("v"))
    sk = SK.kmv_build(df, "v", k=256)
    assert sk.count() == 37
    assert SK.kmv_distinct_estimate(sk, k=256) == 37.0


def test_kmv_estimate_tolerance(spark):
    """Classic KMV accuracy: ~1/sqrt(k) relative error band."""
    df = spark.range(50_000).select(F.col("id").alias("v"))
    est = SK.kmv_distinct_estimate(SK.kmv_build(df, "v", k=256), k=256)
    assert abs(est - 50_000) / 50_000 < 0.2  # 3/sqrt(256) ~ 0.19


def test_kmv_merge_equals_build_on_union(spark):
    """Mergeability: sketch(A) ++ sketch(B) == sketch(A ∪ B), exactly."""
    a = spark.range(0, 3000).select(F.col("id").alias("v"))
    b = spark.range(2000, 6000).select(F.col("id").alias("v"))
    merged = SK.kmv_merge(
        SK.kmv_build(a, "v", k=128), SK.kmv_build(b, "v", k=128), k=128
    )
    direct = SK.kmv_build(a.unionByName(b), "v", k=128)
    assert sorted(r["h"] for r in merged.collect()) == sorted(
        r["h"] for r in direct.collect()
    )


def test_kmv_layout_independent_and_plan(spark):
    """Same sketch for any partitioning; the rank filter must compile to a
    partial-limit physical operator, never a full sort of the domain.
    Spark rewrites ``row_number() <= k`` over an UNpartitioned window to
    TakeOrderedAndProject (global top-k with map-side partials,
    LimitPushDownThroughWindow); a partitionBy window would get
    WindowGroupLimit instead — both are the bounded shape, accept either."""
    df = spark.range(10_000).select((F.col("id") * 7919 % 4001).alias("v"))
    s1 = SK.kmv_build(df, "v", k=64)
    s2 = SK.kmv_build(df.repartition(13), "v", k=64)
    assert [r["h"] for r in s1.orderBy("h").collect()] == [
        r["h"] for r in s2.orderBy("h").collect()
    ]
    plan = s1._sc._jvm.PythonSQLUtils.explainString(
        s1._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in plan or "WindowGroupLimit" in plan, plan


def test_hll_estimate_within_error_bound(spark):
    n = 20_000
    df = spark.range(n).select(F.col("id").cast("string").alias("v"))
    est = SK.hll_estimate(SK.hll_build(df, "v", p=12), p=12)
    # standard error ~ 1.04/sqrt(4096) ~ 1.6%; allow 4 sigma
    assert abs(est - n) / n < 0.065, est


def test_hll_merge_equals_union_and_is_layout_independent(spark):
    a = spark.range(0, 6000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(4000, 12000).select(F.col("id").cast("string").alias("v"))
    sa, sb = SK.hll_build(a, "v"), SK.hll_build(b, "v")
    merged = {(r["reg"], r["max_rank"]) for r in SK.hll_merge(sa, sb).collect()}
    direct = {
        (r["reg"], r["max_rank"])
        for r in SK.hll_build(a.unionByName(b), "v").collect()
    }
    assert merged == direct  # register-exact, not just estimate-close
    repart = {
        (r["reg"], r["max_rank"])
        for r in SK.hll_build(a.unionByName(b).repartition(13), "v").collect()
    }
    assert repart == direct


def test_hll_duplicates_do_not_move_the_sketch(spark):
    a = spark.range(3000).select(F.col("id").cast("string").alias("v"))
    dup = a.unionByName(a).unionByName(a)
    sa = {(r["reg"], r["max_rank"]) for r in SK.hll_build(a, "v").collect()}
    sd = {(r["reg"], r["max_rank"]) for r in SK.hll_build(dup, "v").collect()}
    assert sa == sd


def test_distinct_users_kmv_oracle_staged(spark, sf_dir):
    """Rotation-ready DuckDB twin (registry.DISTINCT_USERS_KMV_ORACLE):
    the portable-md5 KMV estimate is value-exact cross-engine at BOTH
    test SFs — exact-count branch at sf0.001 (< k distinct users),
    estimator branch at sf0.01 — staged for the 6th registry rotation."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from check_oracle import compare, duck_connection

    from compute_histogram_spark.registry import (
        DISTINCT_USERS_KMV_ORACLE,
        q_distinct_users_kmv,
    )

    for sf, branch in ((sf_dir, "exact"), ("/root/testdata/sf0.01", "est")):
        sdf = q_distinct_users_kmv(spark, sf).toPandas()
        con = duck_connection(sf)
        odf = con.sql(DISTINCT_USERS_KMV_ORACLE).df()
        assert compare("distinct_users_kmv", sdf, odf) == [], sf
        row = sdf.iloc[0]
        if branch == "exact":
            assert row["k_used"] < 64 and row["distinct_est"] == row["k_used"]
        else:
            assert row["k_used"] == 64


def test_kmv_portable_estimator_accuracy(spark, sf_dir):
    """On the estimator branch the portable KMV must land near the true
    distinct count (standard error ~1/sqrt(k-2) ~ 13% at k=64; assert a
    generous 3-sigma band)."""
    from pyspark.sql import functions as F

    from compute_histogram_spark.operators.sketches import kmv_distinct_portable
    from compute_histogram_spark.sources.tables import load

    events = load(spark, "/root/testdata/sf0.01", "events")
    exact = events.where(F.col("user_id").isNotNull()).select(
        "user_id"
    ).distinct().count()
    est = kmv_distinct_portable(events, "user_id").collect()[0]["distinct_est"]
    assert abs(est - exact) / exact < 0.4, (est, exact)


def test_token_cms_oracle_staged(spark, sf_dir):
    """Rotation-ready DuckDB twin (registry.TOKEN_CMS_ORACLE): portable-md5
    CMS point estimates at the deterministic exact top-10 tokens are
    value-exact cross-engine at both test SFs — fourth staged twin."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from check_oracle import compare, duck_connection

    from compute_histogram_spark.registry import TOKEN_CMS_ORACLE, q_token_cms

    for sf in (sf_dir, "/root/testdata/sf0.01"):
        sdf = q_token_cms(spark, sf).toPandas()
        con = duck_connection(sf)
        odf = con.sql(TOKEN_CMS_ORACLE).df()
        assert len(sdf) == 10
        assert compare("token_cms", sdf, odf) == [], sf
        # the CMS never undercounts — visible in the oracle-checked data
        assert (sdf["cms_est"] >= sdf["n_exact"]).all()


def test_corpus_overlap_kmv_empty_corpora_defined_zero(spark):
    """Empty (or shingle-free) corpora must yield DEFINED zeros, not the
    NULLs a 0/0 division would produce (ADVICE r13): the overlap of
    empty sketch sets is zero by definition, cross-engine."""
    from compute_histogram_spark.operators.sketches import corpus_overlap_kmv

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    row = corpus_overlap_kmv(empty, empty).collect()[0]
    assert row["k_used"] == 0
    assert row["n_common"] == 0
    assert row["jaccard_est"] == 0.0
    assert row["union_distinct_est"] == 0.0
    assert row["intersection_est"] == 0.0
