"""Similarity search over an embedding column (ARRAY<FLOAT>).

- :func:`cosine_topk` — brute-force top-k: broadcast the (small) query set
  against every candidate, rank per query. The crossJoin is
  broadcast-nested-loop with the QUERY side broadcast: the 100-TB candidate
  table streams through executors once, never shuffles, and the per-query
  ranking is a partial top-k (window over query_id) that AQE keeps local.
- :func:`cosine_topk_ivf` — IVF-style: candidates restricted to the query's
  coarse partition (here the ``label`` column as the cluster assignment; in
  production, k-means centroid ids). This prunes the scan to 1/n_partitions
  of the data — an *equi*-join on the partition key instead of a crossJoin,
  so Spark co-partitions both sides and the plan scales with the bucket
  size, not the corpus.

Ranking determinism: ranks are computed on the 6-decimal-rounded cosine
with vec_id as tie-break, so ordering is identical across engines despite
float summation-order noise.

For very high dims / throughput, the dot-product fold swaps for an
Arrow-batched Pandas UDF doing blocked GEMM (np.dot on [batch x dim]
matrices) — same plan shape, vectorized kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from compute_histogram_spark.functions import vectors as V


def _with_norms(emb: DataFrame) -> DataFrame:
    return emb.select(
        "vec_id",
        "label",
        V.to_double_array("embedding").alias("v"),
    ).withColumn("nrm", V.norm(F.col("v")))


def _ranked(pairs: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "rnk", "vec_id", "cosine")
        .orderBy("query_id", "rnk")
    )


def cosine_topk(
    emb: DataFrame,
    k: int = 5,
    query_filter: str = "vec_id < 10",
) -> DataFrame:
    """Exact top-k neighbors for each query vector (excluding itself)."""
    e = _with_norms(emb)
    q = e.where(query_filter).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(e)
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                V.cosine(F.col("qv"), F.col("v"), F.col("qn"), F.col("nrm")), 6
            ).alias("cosine"),
        )
    )
    return _ranked(pairs, k)


def cosine_topk_ivf(
    emb: DataFrame,
    k: int = 5,
    query_filter: str = "vec_id < 10",
) -> DataFrame:
    """Top-k restricted to the query's own coarse partition (1-probe IVF)."""
    e = _with_norms(emb)
    q = e.where(query_filter).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    pairs = (
        F.broadcast(q)
        .join(e, (F.col("qlabel") == F.col("label")) & (F.col("query_id") != F.col("vec_id")))
        .select(
            "query_id",
            "vec_id",
            F.round(
                V.cosine(F.col("qv"), F.col("v"), F.col("qn"), F.col("nrm")), 6
            ).alias("cosine"),
        )
    )
    return _ranked(pairs, k)
