"""Bigram-LM perplexity: exact hand oracle on a tiny corpus, DuckDB twin
on real testdata, probability-mass sanity, and the filter gate."""

import math

import duckdb
import pytest
from pyspark.sql import Row, functions as F

from compute_histogram_spark.operators.lm import (
    bigram_lm,
    doc_perplexity,
    perplexity_filter,
)
from compute_histogram_spark.sources.tables import load

K = 0.5


def _py_oracle(texts, k=K):
    """Pure-Python add-k bigram LM self-perplexity."""
    pairs_by_doc = {}
    big, ctx, vocab = {}, {}, set()
    for doc_id, t in texts.items():
        toks = t.split(" ")
        ps = list(zip(toks, toks[1:]))
        pairs_by_doc[doc_id] = ps
        for v, w in ps:
            big[(v, w)] = big.get((v, w), 0) + 1
            ctx[v] = ctx.get(v, 0) + 1
            vocab.add(w)
    V = len(vocab)
    out = {}
    for doc_id, ps in pairs_by_doc.items():
        if not ps:
            out[doc_id] = (0, None, None)
            continue
        nll = sum(
            math.log((ctx.get(v, 0) + k * V) / (big.get((v, w), 0) + k))
            for v, w in ps
        )
        out[doc_id] = (
            len(ps),
            round(nll / len(ps), 6),
            round(math.exp(nll / len(ps)), 6),
        )
    return out


def test_exact_hand_oracle(spark):
    texts = {
        0: "a b a b c",
        1: "a b",
        2: "c c c c",
        3: "x",          # 1 token -> no bigrams
        4: "b a b a",
    }
    df = spark.createDataFrame(
        [Row(doc_id=k, text=v) for k, v in texts.items()]
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"], r["ppl"])
        for r in doc_perplexity(df).collect()
    }
    want = _py_oracle(texts)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], d
        if want[d][1] is None:
            assert got[d][1] is None and got[d][2] is None
        else:
            assert got[d][1] == pytest.approx(want[d][1], abs=2e-6)
            assert got[d][2] == pytest.approx(want[d][2], rel=1e-5)


def test_probability_mass_sums_to_one(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, text="a b a c a b"), Row(doc_id=1, text="b a b c")]
    )
    big, ctx, vocab = bigram_lm(df)
    V = vocab.collect()[0]["n_vocab"]
    ctx_map = {r["v"]: r["c_v"] for r in ctx.collect()}
    seen = {}
    for r in big.collect():
        seen.setdefault(r["v"], []).append(r["c_vw"])
    for v, counts in seen.items():
        mass = sum((c + K) / (ctx_map[v] + K * V) for c in counts)
        mass += (V - len(counts)) * K / (ctx_map[v] + K * V)
        assert mass == pytest.approx(1.0, abs=1e-12), v


def test_duckdb_twin_on_testdata(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    got = {
        r["doc_id"]: r for r in doc_perplexity(docs).collect()
    }
    con = duckdb.connect()
    rows = con.execute(f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts
        FROM '{sf_dir}/documents.parquet'
    ),
    pairs AS (
        SELECT doc_id, ts[i] AS v, ts[i+1] AS w
        FROM toks, LATERAL (
            SELECT unnest(generate_series(1, len(ts) - 1)) AS i
        )
    ),
    big AS (SELECT v, w, count(*) AS c_vw FROM pairs GROUP BY v, w),
    ctx AS (SELECT v, count(*) AS c_v FROM pairs GROUP BY v),
    voc AS (SELECT count(DISTINCT w) AS nv FROM pairs)
    SELECT p.doc_id,
           count(*) AS n_bigrams,
           sum(ln((ctx.c_v + {K} * voc.nv) / (big.c_vw + {K}))) AS nll
    FROM pairs p
    JOIN big USING (v, w)
    JOIN ctx USING (v)
    CROSS JOIN voc
    GROUP BY p.doc_id
    """).fetchall()
    assert rows, "oracle produced no rows"
    for doc_id, n, nll in rows:
        r = got[doc_id]
        assert r["n_bigrams"] == n
        assert r["avg_nll"] == pytest.approx(round(nll / n, 6), abs=2e-6)
    # every doc with >= 2 tokens is scored; shorter docs get NULL ppl
    n_scored = sum(1 for r in got.values() if r["n_bigrams"] > 0)
    assert n_scored == len(rows)


def test_cross_corpus_scoring(spark):
    """Score held-out docs against a reference LM: a doc made of unseen
    tokens must be maximally surprising (ppl == V under add-k)."""
    ref = spark.createDataFrame(
        [Row(doc_id=0, text="a b a b a c"), Row(doc_id=1, text="b c a b")]
    )
    heldout = spark.createDataFrame(
        [Row(doc_id=10, text="a b a b"), Row(doc_id=11, text="zz qq zz")]
    )
    out = {r["doc_id"]: r for r in doc_perplexity(heldout, ref=ref).collect()}
    big, ctx, vocab = bigram_lm(ref)
    V = vocab.collect()[0]["n_vocab"]
    assert out[11]["ppl"] == pytest.approx(V, rel=1e-6)  # all-unseen
    assert out[10]["ppl"] < out[11]["ppl"]  # in-distribution is less surprising


def test_perplexity_filter_gate(spark):
    rows = [Row(doc_id=i, text="the cat sat on the mat " * 3) for i in range(8)]
    rows.append(Row(doc_id=99, text="zq xv qp wm zq vv xk jj"))  # gibberish
    rows.append(Row(doc_id=100, text="solo"))  # too short to score
    df = spark.createDataFrame(rows)
    ppl = {r["doc_id"]: r["ppl"] for r in doc_perplexity(df).collect()}
    cut = (ppl[0] + ppl[99]) / 2
    kept = {r["doc_id"] for r in perplexity_filter(df, max_ppl=cut).collect()}
    assert 99 not in kept
    assert set(range(8)) <= kept
    assert 100 in kept  # unscorable docs pass through


def _py_backoff(texts, score_texts=None, alpha=0.4):
    """Pure-Python stupid-backoff trigram oracle."""
    ref = texts if score_texts is None else texts
    tri, ctx2, big, ctx1, uni = {}, {}, {}, {}, {}
    n_total = 0
    for t in ref.values():
        toks = t.split(" ")
        n_total += len(toks)
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
            ctx1[w] = ctx1.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
        for a, b, c in zip(toks, toks[1:], toks[2:]):
            tri[(a, b, c)] = tri.get((a, b, c), 0) + 1
            ctx2[(a, b)] = ctx2.get((a, b), 0) + 1
    out = {}
    for doc_id, t in (score_texts or texts).items():
        toks = t.split(" ")
        tgs = list(zip(toks, toks[1:], toks[2:]))
        if not tgs:
            out[doc_id] = (0, None)
            continue
        s = 0.0
        for a, b, c in tgs:
            if (a, b, c) in tri:
                s += -math.log(tri[(a, b, c)] / ctx2[(a, b)])
            elif (b, c) in big:
                s += -math.log(alpha * big[(b, c)] / ctx1[b])
            else:
                s += -math.log(alpha * alpha * max(uni.get(c, 0), 0.5) / n_total)
        out[doc_id] = (len(tgs), round(s / len(tgs), 6))
    return out


def test_backoff_exact_hand_oracle(spark):
    from compute_histogram_spark.operators.lm import doc_perplexity_backoff

    texts = {
        0: "a b c a b c a b d",
        1: "a b c",
        2: "c a b",
        3: "x y",  # 2 tokens -> no trigrams
    }
    df = spark.createDataFrame(
        [Row(doc_id=k, text=v) for k, v in texts.items()]
    )
    got = {
        r["doc_id"]: (r["n_trigrams"], r["avg_nls"])
        for r in doc_perplexity_backoff(df).collect()
    }
    want = _py_backoff(texts)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], d
        if want[d][1] is None:
            assert got[d][1] is None
        else:
            assert got[d][1] == pytest.approx(want[d][1], abs=2e-6), d


def test_backoff_cross_corpus_oov_is_finite_and_worst(spark):
    from compute_histogram_spark.operators.lm import doc_perplexity_backoff

    ref = spark.createDataFrame(
        [Row(doc_id=0, text="the cat sat on the mat the cat ran")]
    )
    held = spark.createDataFrame(
        [
            Row(doc_id=10, text="the cat sat on the mat"),
            Row(doc_id=11, text="zz qq ww rr tt yy"),  # all OOV
        ]
    )
    out = {
        r["doc_id"]: r
        for r in doc_perplexity_backoff(held, ref=ref).collect()
    }
    assert out[11]["avg_nls"] is not None  # OOV floor keeps logs finite
    assert out[10]["avg_nls"] < out[11]["avg_nls"]


def test_backoff_on_testdata_is_scored(spark, sf_dir):
    from compute_histogram_spark.operators.lm import doc_perplexity_backoff

    docs = load(spark, sf_dir, "documents")
    rows = doc_perplexity_backoff(docs).collect()
    n_docs = docs.count()
    assert len(rows) == n_docs
    scored = [r for r in rows if r["n_trigrams"] > 0]
    assert len(scored) > 0
    for r in scored[:50]:
        assert r["avg_nls"] is not None and r["avg_nls"] > 0
