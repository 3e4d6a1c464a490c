"""N-gram language-model perplexity — the CCNet-style quality signal.

Production LLM-data pipelines score every document with a small language
model and drop the high-perplexity tail (CCNet, Gopher, Llama data prep).
This module is the distributed, model-free version: an add-k-smoothed
bigram LM trained ON a reference corpus entirely as DataFrame aggregates,
then used to score any corpus — no Python in the hot path, no model
artifact, exact arithmetic on integer counts until the final log.

Semantics (standard add-k bigram LM):
    P(w | v) = (c(v, w) + k) / (c(v) + k * V)
where c(v, w) is the bigram count in the reference corpus, c(v) the
context count (sum over w of c(v, w), so probabilities sum to exactly 1),
V the next-token vocabulary size, and k the smoothing constant. Per doc:
    avg_nll = mean over bigrams of ln(1 / P(w | v)),    ppl = e^avg_nll

Scale shape (100 TB): training is two partial->final count aggregations
whose shuffles are bounded by the number of DISTINCT bigrams/contexts
(vocab-shaped, not corpus-shaped). Scoring shuffles the document bigrams
once to join the bigram table (AQE broadcasts it while it fits), then the
context table on a 1-token key. V rides along as a broadcast 1-row
dimension — no driver-side collect anywhere. Docs with < 2 tokens emit
n_bigrams = 0 and NULL perplexity rather than vanishing.

Cross-engine note: counts and V are exact integers in both engines; the
only floats are the final ln/exp, so a DuckDB twin agrees to ~1e-12
relative (pinned with tolerance in tests/test_lm.py, alongside an exact
hand-computed oracle on a tiny corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from compute_histogram_spark.functions.texthash import tokens
from compute_histogram_spark.sources.tables import ensure_parallelism


def _doc_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, v, w) — one row per adjacent token pair, built map-side
    from the token array (no per-token explode before pairing)."""
    return (
        docs.select("doc_id", tokens("text").alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, size(toks) - 1), "
                    "(x, i) -> struct(x AS v, toks[i + 1] AS w))"
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.v").alias("v"), F.col("p.w").alias("w"))
    )


def bigram_lm(ref: DataFrame):
    """Train: -> (bigram counts (v, w, c_vw), context counts (v, c_v),
    vocab size as a broadcastable 1-row DataFrame (n_vocab))."""
    ref = ensure_parallelism(ref)
    pairs = _doc_bigrams(ref)
    big = pairs.groupBy("v", "w").agg(F.count(F.lit(1)).alias("c_vw"))
    ctx = pairs.groupBy("v").agg(F.count(F.lit(1)).alias("c_v"))
    vocab = pairs.select(
        F.count_distinct("w").alias("n_vocab")
    )  # 1 row, vocab-bounded agg — broadcast, never collected
    return big, ctx, vocab


def doc_perplexity(
    docs: DataFrame, ref: DataFrame | None = None, k: float = 0.5
) -> DataFrame:
    """Score every doc with an add-k bigram LM trained on ``ref``
    (defaults to ``docs`` itself — self-perplexity flags statistical
    outliers for quality filtering).

    -> (doc_id, n_bigrams, avg_nll, ppl), ordered by doc_id.
    """
    docs = ensure_parallelism(docs)
    big, ctx, vocab = bigram_lm(docs if ref is None else ref)

    pairs = _doc_bigrams(docs)
    scored = (
        pairs.join(big, ["v", "w"], "left")
        .join(ctx, ["v"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            # unseen context -> c_v = 0 -> P = k/(kV) = 1/V; unseen bigram
            # under a seen context -> numerator k. ln of a ratio whose
            # parts are exact (integer + k) in both engines.
            F.log(
                (F.coalesce(F.col("c_v"), F.lit(0)) + k * F.col("n_vocab"))
                / (F.coalesce(F.col("c_vw"), F.lit(0)) + F.lit(k))
            ).alias("nll"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("nll").alias("nll_sum"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.round(F.col("nll_sum") / F.col("n_bigrams"), 6).alias("avg_nll"),
            F.round(F.exp(F.col("nll_sum") / F.col("n_bigrams")), 6).alias(
                "ppl"
            ),
        )
        .orderBy("doc_id")
    )


def _doc_trigrams(docs: DataFrame) -> DataFrame:
    return (
        docs.select("doc_id", tokens("text").alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, size(toks) - 2), "
                    "(x, i) -> struct(x AS v1, toks[i + 1] AS v2, "
                    "toks[i + 2] AS v3))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.v1", "p.v2", "p.v3")
    )


def doc_perplexity_backoff(
    docs: DataFrame, ref: DataFrame | None = None, alpha: float = 0.4
) -> DataFrame:
    """Stupid-backoff trigram score (Brants et al. 2007, "Large Language
    Models in Machine Translation") — the LM big web pipelines actually
    train, because unnormalized backoff needs ONLY count tables:

        S(w3 | w1 w2) = c(w1w2w3)/c(w1w2)          if trigram seen
                      = a * c(w2w3)/c(w2)           elif bigram seen
                      = a^2 * c(w3)/N               else

    Every count table is a partial->final aggregation bounded by distinct
    n-grams; scoring is four left joins on token keys plus a broadcast
    1-row total. All scores are ratios of exact integers times powers of
    ``alpha``, so engines agree to float ulp.

    -> (doc_id, n_trigrams, avg_nls, score) where ``avg_nls`` is the mean
    negative log-score (lower = more fluent) and ``score = e^-avg_nls``.
    """
    docs = ensure_parallelism(docs)
    self_scoring = ref is None
    r = docs if self_scoring else ensure_parallelism(ref)
    rtri = _doc_trigrams(r)
    tri = rtri.groupBy("v1", "v2", "v3").agg(F.count(F.lit(1)).alias("c3"))
    ctx2 = rtri.groupBy("v1", "v2").agg(F.count(F.lit(1)).alias("c2ctx"))

    pairs = _doc_trigrams(docs)
    if self_scoring:
        # every scored trigram came from the same corpus the counts were
        # trained on, so the trigram branch always fires — the backoff
        # joins would match zero rows. INNER joins, no CASE: same values,
        # two fewer count tables and three fewer shuffled joins.
        s = (
            pairs.join(tri, ["v1", "v2", "v3"])
            .join(ctx2, ["v1", "v2"])
            .select(
                "doc_id", (-F.log(F.col("c3") / F.col("c2ctx"))).alias("nls")
            )
        )
    else:
        runi = r.select(F.explode(tokens("text")).alias("w"))
        big = (
            _doc_bigrams(r)
            .groupBy(F.col("v").alias("v2"), F.col("w").alias("v3"))
            .agg(F.count(F.lit(1)).alias("c2"))
        )
        ctx1 = (
            runi.groupBy(F.col("w").alias("v2"))
            .agg(F.count(F.lit(1)).alias("c1ctx"))
        )
        uni = runi.groupBy(F.col("w").alias("v3")).agg(
            F.count(F.lit(1)).alias("c1")
        )
        total = runi.select(F.count(F.lit(1)).alias("n_total"))
        s = (
            pairs.join(tri, ["v1", "v2", "v3"], "left")
            .join(ctx2, ["v1", "v2"], "left")
            .join(big, ["v2", "v3"], "left")
            .join(ctx1, ["v2"], "left")
            .join(uni, ["v3"], "left")
            .crossJoin(F.broadcast(total))
            .select(
                "doc_id",
                F.when(
                    F.col("c3").isNotNull(),
                    -F.log(F.col("c3") / F.col("c2ctx")),
                )
                .when(
                    F.col("c2").isNotNull(),
                    -F.log(F.lit(alpha) * F.col("c2") / F.col("c1ctx")),
                )
                .otherwise(
                    # OOV floor: an unseen unigram scores as half a count
                    # so the log stays finite (the standard epsilon hack —
                    # stupid backoff itself is unsmoothed)
                    -F.log(
                        F.lit(alpha * alpha)
                        * F.greatest(
                            F.coalesce(F.col("c1"), F.lit(0.0)), F.lit(0.5)
                        )
                        / F.col("n_total")
                    )
                )
                .alias("nls"),
            )
        )
    per_doc = s.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.sum("nls").alias("nls_sum"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_trigrams"), F.lit(0)).alias("n_trigrams"),
            F.round(F.col("nls_sum") / F.col("n_trigrams"), 6).alias(
                "avg_nls"
            ),
            F.round(
                F.exp(-F.col("nls_sum") / F.col("n_trigrams")), 6
            ).alias("score"),
        )
        .orderBy("doc_id")
    )


def perplexity_filter(
    docs: DataFrame,
    ref: DataFrame | None = None,
    max_ppl: float = 1000.0,
    k: float = 0.5,
) -> DataFrame:
    """The pipeline gate: keep docs whose LM perplexity is at most
    ``max_ppl`` (docs too short to score pass through — length-based
    gates are a separate signal, operators/text.py quality_signals)."""
    ppl = doc_perplexity(docs, ref=ref, k=k)
    keep = ppl.where(
        (F.col("n_bigrams") == 0) | (F.col("ppl") <= max_ppl)
    ).select("doc_id")
    return docs.join(keep, "doc_id", "left_semi")
