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
bucket id (a splitmix-style integer mix), standing in for trained
fastText/logistic weights the same way the multimodal suite's
deterministic fake stands in for codec output: the PLUMBING (hashing,
join, exact aggregation, calibration) is real and oracle-checked; the
weights are whatever the user trained.
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
