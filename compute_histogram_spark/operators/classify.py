"""Model-based text filtering: the fastText-style hashed linear scorer.

Every production web-corpus pipeline (CCNet, C4, FineWeb) gates
documents through a cheap linear classifier over hashed n-gram
features — a weight vector small enough to broadcast, applied as one
map + one per-doc aggregation. This module is that operator with the
repo's portability conventions:

- features = unigrams + word bigrams, each hashed into ``n_buckets``
  via the md5 digest convention (functions/texthash.py), so a DuckDB
  twin replicates bucket ids exactly;
- weights are INTEGER milli-units: the per-doc accumulation is an
  exact int64 sum (no float-order divergence between engines or
  partitionings); only the final sigmoid is floating point, rounded
  to 6 (the doc_perplexity ln/round-6 precedent);
- the weight table is ``n_buckets``-bounded and broadcast — the scale
  shape is a map over tokens + ONE doc-keyed hash aggregation; at
  100 TB the classifier costs one corpus pass, same as text_stats.

``demo_weights`` derives a deterministic weight per bucket from the
bucket id (a splitmix-style integer mix) — the oracle-checkable fixture;
REAL weights come from :func:`train_logistic` (r12), the distributed
logistic trainer over the same hashed features. The module also carries
the surrounding model-filter lifecycle: :func:`classifier_pr_curve`
picks the gate threshold and :func:`dsir_select` does distribution-
matching data selection (DSIR) with the same feature space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from compute_histogram_spark.functions.texthash import tokens
from compute_histogram_spark.sources.tables import ensure_parallelism

DEFAULT_BUCKETS = 4096


def _bucket(col, n_buckets: int):
    """md5('ft:' || feature) -> [0, n_buckets): first 8 hex digits parsed
    as an integer, modulo the table size — the portable convention every
    sketch/split twin in this repo uses."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit("ft:"), col)), 1, 8), 16, 10)
        .cast("bigint")
        % n_buckets
    ).cast("int")


def demo_weights(
    spark: SparkSession, n_buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """Deterministic (bucket, w_milli) fixture weights: an integer mix of
    the bucket id folded to [-500, 500) milli-units. Replicable in SQL,
    so the oracle can rebuild the identical table."""
    return spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket"),
        ((F.col("id") * F.lit(2654435761) + F.lit(40503))
         % 1000 - 500).cast("bigint").alias("w_milli"),
    )


def hashed_features(
    docs: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bucket) — one row per unigram + word-bigram occurrence.

    Bigrams are joined with a single space (the fastText convention);
    documents shorter than 2 tokens emit unigrams only. Pure JVM
    expressions; the explode is the only row multiplier (~2x tokens)."""
    docs = ensure_parallelism(docs)
    toks = tokens(text_col)
    bigrams = F.expr(
        "CASE WHEN size({t}) >= 2 THEN transform("
        "  sequence(1, size({t}) - 1),"
        "  i -> concat({t}[i - 1], ' ', {t}[i]))"
        " ELSE array() END".format(t=f"split({text_col}, ' ')")
    )
    feats = F.concat(toks, bigrams)
    return docs.select(
        id_col, F.explode(feats).alias("f")
    ).select(id_col, _bucket(F.col("f"), n_buckets).alias("bucket"))


def linear_text_score(
    docs: DataFrame,
    weights: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    bias_milli: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    ordered: bool = False,
) -> DataFrame:
    """Per-document linear score + sigmoid calibration.

    ``weights`` is (bucket INT, w_milli BIGINT) — trained weights in
    integer milli-units (a trained float vector quantizes losslessly
    enough at 1e-3 for filtering; integer summation makes the result
    independent of partitioning and engine). The mean feature weight —
    sum(w)/n_features — normalizes for document length exactly the way
    fastText averages its input vectors, then the sigmoid maps to (0,1).

    -> (doc_id, n_features, logit_milli, score)
    Plan: map -> broadcast LEFT join on the bucket-bounded weight table
    (missing buckets count as zero-weight features — a sparse trained
    table must not shrink the n_features denominator; ADVICE r11) ->
    one doc-keyed hash agg; nothing driver-side, nothing data-scaled in
    the build side. ``ordered=True`` adds a presentation sort for the
    oracle/driver compare only — the pipeline-facing default is
    unordered, so composed plans (score_filter) never inherit a range
    exchange (the url_dedup precedent, r11)."""
    feats = hashed_features(docs, n_buckets, text_col, id_col)
    j = feats.join(F.broadcast(weights), "bucket", "left")
    agg = j.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_features"),
        F.sum(F.coalesce(F.col("w_milli"), F.lit(0))).alias("sum_w_milli"),
    )
    # mean milli-weight + bias, computed exactly; float enters only here
    logit_milli = (
        F.col("sum_w_milli") / F.col("n_features") + F.lit(bias_milli)
    )
    out = agg.select(
        id_col,
        F.col("n_features").cast("bigint").alias("n_features"),
        F.round(logit_milli, 6).alias("logit_milli"),
        F.round(
            1.0 / (1.0 + F.exp(-logit_milli / 1000.0)), 6
        ).alias("score"),
    )
    return out.orderBy(id_col) if ordered else out


def score_filter(
    docs: DataFrame,
    weights: DataFrame,
    threshold: float = 0.5,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep documents scoring >= threshold — the pipeline-facing gate
    (CCNet/FineWeb 'model filter' stage): a semi-join of the corpus
    against its own score table, so payload text never rides the
    scoring shuffle."""
    keep = linear_text_score(
        docs, weights, n_buckets, text_col=text_col, id_col=id_col
    ).where(F.col("score") >= threshold).select(id_col)
    return docs.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# Distributed training (r12, VERDICT r11 #3): the piece that turns the
# scorer from plumbing-with-fixture-weights into the full CCNet/FineWeb
# stage — a logistic regression over the SAME hashed features the scorer
# applies, trained by full-batch gradient descent where each epoch is
# ONE bucket-keyed aggregation over the (persisted) feature table.
#
# Scale shape per epoch, at any corpus size:
#   1. score: broadcast join of the n_buckets-bounded weight table onto
#      the persisted (doc, bucket, count) table + one doc-keyed agg;
#   2. gradient: one doc-keyed join of the per-doc error scalars back
#      onto the counts + one bucket-keyed agg -> <= n_buckets rows.
# The ONLY driver-side state is the weight vector and per-epoch gradient
# (n_buckets scalars each — the bounded model-state collect class every
# sketch/centroid op in this repo uses). Nothing data-scaled ever leaves
# the executors; feature hashing is computed once and persisted, so
# epochs re-read a materialized columnar table, not the raw text.
#
# Determinism (the twin convention): the per-doc error and loss are
# quantized to integer MICRO-units immediately after the (per-doc,
# scalar, IEEE-deterministic) sigmoid, and every cross-row reduction is
# an int64 SUM — order- and partitioning-independent, so the same data
# gives the same weights on any cluster layout, and a NumPy twin
# replicates training exactly (tests/test_classify.py).
# ---------------------------------------------------------------------------


def train_logistic(
    docs: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    epochs: int = 8,
    damping: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "label",
) -> tuple[DataFrame, int, list[float]]:
    """Train fastText-style logistic weights on ``docs`` with a binary
    ``label_col`` (0/1). Returns ``(weights, bias_milli, loss_history)``
    where ``weights`` is the (bucket, w_milli) table ``linear_text_score``
    consumes and ``loss_history`` holds the mean log-loss per epoch.

    Model: p(doc) = sigmoid((mean feature milli-weight + bias) / 1000)
    — exactly ``linear_text_score``'s forward pass, so the trained table
    drops into ``score_filter`` unchanged.

    Optimizer: a diagonal MAJORIZE-MINIMIZE step, not plain gradient
    descent — the mean-normalized model is badly conditioned (the bias
    sees the full error signal while each bucket weight sees it scaled
    by c/n ~ 1e-2; one global learning rate either crawls on the weights
    or oscillates on the bias — measured on the driver corpus before
    this was adopted). Because each doc's feature vector is
    L1-normalized (the c/n entries sum to exactly 1), the logistic
    Hessian X'SX is majorized by the DIAGONAL matrix
    diag(sum_d p(1-p) * c/n) — Jensen over the convex square — so
    stepping each coordinate by damping * g/h with that h decreases the
    loss monotonically for damping <= 1 even though thousands of
    correlated coordinates move at once (raw diagonal Newton, curvature
    sum(p(1-p) * (c/n)^2), was tried first and DIVERGED to all-1 scores:
    it overshoots by ~n_features_per_doc). Each epoch accumulates g and
    h in the same bucket-keyed aggregation; ``damping`` 0.8 splits the
    majorization slack with the bias coordinate."""
    spark = docs.sparkSession
    # features hashed ONCE; counts persisted across epochs
    feats = hashed_features(docs, n_buckets, text_col, id_col)
    cnt = (
        feats.groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    doc_info = (
        cnt.groupBy(id_col)
        .agg(F.sum("c").alias("n"))
        .join(docs.select(id_col, F.col(label_col).alias("y")), id_col)
        .persist()
    )
    n_docs = doc_info.count()  # also materializes both persisted tables
    if n_docs == 0:
        raise ValueError("train_logistic: no labeled documents")

    w = [0] * n_buckets  # milli-units, int
    bias_milli = 0
    history: list[float] = []
    try:
        for _ in range(epochs):
            w_df = spark.createDataFrame(
                [(b, wv) for b, wv in enumerate(w)], "bucket int, w_milli long"
            )
            scored = (
                cnt.join(F.broadcast(w_df), "bucket", "left")
                .groupBy(id_col)
                .agg(
                    F.sum(
                        F.col("c") * F.coalesce(F.col("w_milli"), F.lit(0))
                    ).alias("s_milli")
                )
            )
            # per-doc scalars: logit -> p -> error/loss, quantized to
            # integer micros the moment float enters
            logit = (
                (F.col("s_milli") / F.col("n") + F.lit(bias_milli)) / 1000.0
            )
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
            p = F.least(F.lit(1.0 - 1e-9), F.greatest(F.lit(1e-9), p))
            err = (
                scored.join(doc_info, id_col)
                .select(
                    id_col,
                    F.col("n"),
                    F.round((p - F.col("y")) * 1e6).cast("long")
                    .alias("err_micro"),
                    F.round(p * (F.lit(1.0) - p) * 1e6).cast("long")
                    .alias("hess_micro"),
                    F.round(
                        -(
                            F.col("y") * F.log(p)
                            + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - p)
                        )
                        * 1e6
                    ).cast("long").alias("loss_micro"),
                )
            ).persist()  # two consumers below; freed before the next epoch
            # gradient + curvature: err joins back to counts doc-keyed,
            # ONE bucket-keyed agg -> <= n_buckets rows (+ 3 scalar sums)
            grad_rows = (
                cnt.join(err, id_col)
                .groupBy("bucket")
                .agg(
                    F.sum(
                        F.round(
                            F.col("err_micro") * F.col("c") / F.col("n")
                        ).cast("long")
                    ).alias("g_micro"),
                    F.sum(
                        F.round(
                            F.col("hess_micro") * F.col("c") / F.col("n")
                        ).cast("long")
                    ).alias("h_micro"),
                )
                .collect()
            )
            sums = err.agg(
                F.sum("err_micro").alias("ge"),
                F.sum("hess_micro").alias("he"),
                F.sum("loss_micro").alias("ls"),
            ).collect()[0]
            err.unpersist()
            history.append(float(sums["ls"]) / 1e6 / n_docs)
            # driver-side updates on n_buckets scalars: deterministic
            # integer arithmetic only (the +1 guards empty curvature)
            for r in grad_rows:
                w[r["bucket"]] -= round(
                    damping * 1000.0 * r["g_micro"] / (r["h_micro"] + 1)
                )
            bias_milli -= round(
                damping * 1000.0 * sums["ge"] / (sums["he"] + 1)
            )
    finally:
        cnt.unpersist()
        doc_info.unpersist()

    weights = spark.createDataFrame(
        [(b, wv) for b, wv in enumerate(w)], "bucket int, w_milli long"
    )
    return weights, bias_milli, history


# ---------------------------------------------------------------------------
# DSIR — Data Selection with Importance Resampling (Xie et al. 2023):
# select source documents whose hashed-ngram distribution matches a
# TARGET corpus. The repo shape: both corpora reduce to n_buckets-bounded
# count tables over the SAME md5-hashed unigram+bigram features the
# quality scorer uses; each bucket's log-likelihood-ratio
# ln(p_target/p_source) (add-1 smoothed) is quantized ONCE to integer
# micro-units in a bounded broadcast table, so every per-document weight
# is an exact int64 sum — partitioning/engine-independent, DuckDB-
# twinnable (the milli-weight convention of linear_text_score applied to
# distribution matching).
# ---------------------------------------------------------------------------


def dsir_bucket_llr(
    target: DataFrame,
    source: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(bucket, llr_micro): add-1-smoothed log-likelihood ratio of each
    hashed-feature bucket under the target vs source distribution,
    quantized to integer micro-nats. Two bounded aggregations; the
    output is <= n_buckets rows (broadcast class)."""
    tc = (
        hashed_features(target, n_buckets, text_col, id_col)
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("ct"))
    )
    sc = (
        hashed_features(source, n_buckets, text_col, id_col)
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("cs"))
    )
    spark = target.sparkSession
    buckets = spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    # r16 optimization round: ``j`` is referenced twice below (the
    # totals scalar and the crossJoin output), and without a cache each
    # reference re-ran BOTH feature-hashing corpus aggregations
    # (before-plan: 4 of dsir_weights' 5 documents scans came from this
    # diamond). ``j`` is <= n_buckets rows — guide §5's
    # cache-when-reused case — so persisting it leaves one evaluation
    # of tc/sc and puts dsir_weights at its 3-scan structural floor
    # (target slice + source + the per-doc weights pass).
    from pyspark import StorageLevel

    j = (
        buckets.join(tc, "bucket", "left").join(sc, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cs", F.lit(0)).alias("cs"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # the two corpus totals ride a ONE-row scalar crossJoin (the
    # bm25/token_pmi pattern) so building this plan stays LAZY — the
    # first cut collect()ed them at construction time, which ran both
    # feature-hashing aggregations just to BUILD the DataFrame (the
    # eager-checkpoint lesson, ADVICE r11)
    tot = j.agg(
        F.sum("ct").cast("double").alias("nt"),
        F.sum("cs").cast("double").alias("ns"),
    )
    llr = (
        F.log((F.col("ct") + 1.0) / (F.col("nt") + n_buckets))
        - F.log((F.col("cs") + 1.0) / (F.col("ns") + n_buckets))
    )
    from compute_histogram_spark.session import defer_release

    # tag the n_buckets-bounded cache for deterministic release by the
    # caller after its action (r17, VERDICT r16 #3)
    return defer_release(
        j.crossJoin(F.broadcast(tot))
        .select("bucket", F.round(llr * 1e6).cast("long").alias("llr_micro")),
        j,
    )


def dsir_log_weights(
    docs: DataFrame,
    llr: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_features, logw_micro): per-document importance
    log-weight = sum of its features' bucket LLRs — an exact integer
    sum over the broadcast LLR table (map + one doc-keyed agg, the
    linear_text_score plan shape)."""
    feats = hashed_features(docs, n_buckets, text_col, id_col)
    j = feats.join(F.broadcast(llr), "bucket", "left")
    return (
        j.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum(F.coalesce("llr_micro", F.lit(0)))
            .alias("logw_micro"),
        )
        .select(
            id_col,
            F.col("n_features").cast("bigint").alias("n_features"),
            F.col("logw_micro").cast("bigint").alias("logw_micro"),
        )
    )


def dsir_select(
    target: DataFrame,
    source: DataFrame,
    k: int,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
    gumbel: bool = True,
) -> DataFrame:
    """Top-k source documents under DSIR: score = log-weight plus (by
    default) a DETERMINISTIC Gumbel perturbation derived from
    md5(doc_id) — the Gumbel-top-k trick makes the selection a sample
    from the importance distribution rather than a hard argmax, and the
    hash-derived uniform keeps it rerun/layout/engine-stable (the
    weighted_sample A-ES precedent). gumbel=False gives the plain
    highest-weight selection. Top-k compiles to TakeOrderedAndProject —
    no global sort shuffle.

    -> (doc_id, logw_micro, score) ordered by (score desc, doc_id)."""
    w = dsir_log_weights(source, dsir_bucket_llr(
        target, source, n_buckets, text_col, id_col
    ), n_buckets, text_col, id_col)
    if gumbel:
        u = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("dsir:"), F.col(id_col).cast("string"))),
                    1, 8,
                ), 16, 10,
            ).cast("double") + 0.5
        ) / 4294967296.0
        score = F.round(
            F.col("logw_micro") / 1e6 - F.log(-F.log(u)), 6
        )
    else:
        score = F.round(F.col("logw_micro") / 1e6, 6)
    return (
        w.select(id_col, "logw_micro", score.alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def classifier_pr_curve(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    n_thresholds: int = 10,
) -> DataFrame:
    """Precision/recall/F1 sweep over evenly spaced thresholds — the
    evaluation every model-filter deployment runs before picking its
    gate (choose the threshold, THEN score_filter with it).

    Exact arithmetic: per-threshold counts are integer sums over one
    cross join with the bounded thresholds table (n_thresholds rows,
    broadcast) + one bounded-key aggregation — a single corpus pass at
    any scale; ratios are two-integer divisions rounded 6 (engine-exact
    given exact counts). Thresholds are i/n_thresholds, i in [0, n).

    -> (threshold, n_pred_pos, n_true_pos, precision, recall, f1)
    Empty prediction sets yield NULL precision/f1 (0/0), matching SQL
    division semantics in both engines."""
    spark = scored.sparkSession
    th = spark.range(n_thresholds).select(
        (F.col("id") / n_thresholds).alias("threshold")
    )
    j = scored.select(
        F.col(score_col).alias("s"), F.col(label_col).alias("y")
    ).crossJoin(F.broadcast(th))
    n_pos = F.sum(F.col("y").cast("long"))
    agg = j.groupBy("threshold").agg(
        F.sum((F.col("s") >= F.col("threshold")).cast("long"))
        .alias("n_pred_pos"),
        F.sum(
            ((F.col("s") >= F.col("threshold")) & (F.col("y") == 1))
            .cast("long")
        ).alias("n_true_pos"),
        n_pos.alias("n_pos"),
    )
    # try_divide, not `/`: the driver session runs ANSI mode, where a
    # 0/0 empty-prediction bucket must yield NULL, not DIVIDE_BY_ZERO
    prec = F.try_divide(F.col("n_true_pos"), F.col("n_pred_pos"))
    rec = F.try_divide(F.col("n_true_pos"), F.col("n_pos"))
    return agg.select(
        F.round("threshold", 6).alias("threshold"),
        "n_pred_pos",
        "n_true_pos",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(
            F.try_divide(2 * prec * rec, prec + rec), 6
        ).alias("f1"),
    ).orderBy("threshold")
