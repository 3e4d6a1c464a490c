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
from compute_histogram_spark.sources.tables import ensure_parallelism


def _with_norms(emb: DataFrame) -> DataFrame:
    # deliberately NO repartition here: at 5k-row local scale the extra
    # exchange costs more than single-partition vector math saves (measured
    # 2x slower); at cluster scale the scan arrives in many splits anyway
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
    # candidate side only: the embeddings fixture scans as 1-2 splits, which
    # would serialize the pair-explosion dot fold onto 2 of 32 cores; the
    # query side stays exchange-free (it is collected for broadcast anyway).
    # At warehouse scale the guard makes this a no-op (no gratuitous
    # shuffle). Measured sf1: 1.01 -> 0.55 s; sf0.1: 0.47 -> 0.42 s
    # (BASELINE.md r9). Values are partition-independent: the dot fold is
    # per-row in index order.
    pairs = (
        F.broadcast(q)
        .crossJoin(ensure_parallelism(e))
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


# ---------------------------------------------------------------------------
# Random-hyperplane LSH — the scale path that needs NO precomputed partition
# label: bucket = sign pattern of dot products against fixed hyperplanes.
# ---------------------------------------------------------------------------

QUANT = 1_000_000  # fixed-point scale for exact cross-engine sign decisions


def hyperplanes(dim: int, n_planes: int, table: int = 0) -> list[list[int]]:
    """Deterministic ±1 hyperplanes from md5(table:j:g) nibble parity — the
    same constants are embeddable as literals in any engine (no RNG, no
    seed state), so bucket assignments agree everywhere by construction."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{table}:{j}:{g}".encode()).hexdigest()[0], 16) % 2
            else -1
            for g in range(dim)
        ]
        for j in range(n_planes)
    ]


def lsh_bucket_expr(vcol: F.Column, planes: list[list[int]]) -> F.Column:
    """Bucket id from sign bits of quantized dot products.

    Components are quantized to integers (round(x * 1e6)) BEFORE the dot:
    an integer sum is associative, so the sign — and therefore the bucket —
    is bit-identical regardless of engine or summation order. A float dot
    would flip signs near zero on ulp-level noise between engines.
    """
    q = F.transform(vcol, lambda x: F.round(x * QUANT).cast("bigint"))
    bucket = F.lit(0)
    for j, plane in enumerate(planes):
        arr = F.array(*[F.lit(c) for c in plane])
        s = F.aggregate(
            F.zip_with(q, arr, lambda a, b: a * b),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(s >= 0, F.lit(2**j)).otherwise(F.lit(0))
    return bucket.cast("bigint")


def lsh_buckets_kernel(n_planes: int, n_tables: int):
    """Arrow-vectorized bucket assignment: one [batch x dim] @ [dim x J*L]
    GEMM per batch instead of J*L folded codegen expressions per row (the
    expression form compiles minutes of generated Java at J*L=32).

    Bit-identical to :func:`lsh_bucket_expr`: quantization replicates
    Spark/DuckDB ``round`` (HALF_UP, away from zero) — NOT np.round
    (half-even) — then all-integer dot products, so the sign decisions
    match the SQL oracle exactly.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    weights = np.array([1 << j for j in range(n_planes)], dtype=np.int64)
    pm_cache = {}

    def _planes(dim):
        # built lazily from the observed dim — avoids a driver-side probe job
        if dim not in pm_cache:
            hp = [hyperplanes(dim, n_planes, t) for t in range(n_tables)]
            pm_cache[dim] = np.array(
                [
                    [hp[t][j][g] for t in range(n_tables) for j in range(n_planes)]
                    for g in range(dim)
                ],
                dtype=np.int64,
            )
        return pm_cache[dim]

    def _kernel(vs):
        m = np.stack(vs.to_numpy()) * QUANT  # [batch, dim] float64
        pm = _planes(m.shape[1])
        q = np.where(m >= 0, np.floor(m + 0.5), np.ceil(m - 0.5)).astype(np.int64)
        signs = (q @ pm) >= 0  # [batch, J*L]
        b = signs.reshape(len(q), n_tables, n_planes) @ weights  # [batch, L]
        return pd.Series(list(b))

    # explicit form: `from __future__ import annotations` stringifies hints,
    # which pandas_udf's signature inspection rejects
    return pandas_udf(_kernel, "array<bigint>")


def cosine_topk_lsh(
    emb: DataFrame,
    k: int = 5,
    query_filter: str = "vec_id < 10",
    n_planes: int = 4,
    n_tables: int = 8,
) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH (OR-construction).

    Single-table sign-LSH has recall (1 - theta/pi)^n_planes — too low even
    for true neighbors — so, as in every production LSH index, we hash into
    ``n_tables`` independent tables and union the candidates: a pair is a
    candidate if it collides in ANY table (recall 1-(1-p^J)^L), then exact
    cosine reranks. All joins are equi-joins on (table, bucket) — Spark
    co-partitions both sides; no crossJoin, scan ~n_tables * corpus/2^J.

    Defaults (J=4, L=8) give ~0.6 recall@5 on the driver's synthetic
    embeddings (weakly clustered — hard for LSH). Tuning: raise J as the
    corpus grows (smaller buckets; rerank cost ~L*n/2^J per query) and
    raise L to buy recall back (candidate recall = 1-(1-p^J)^L with
    p = 1 - theta/pi).
    """
    e = _with_norms(emb)
    eb = e.withColumn(
        "bs", lsh_buckets_kernel(n_planes, n_tables)(F.col("v"))
    ).select("vec_id", "v", "nrm", F.posexplode("bs").alias("t", "bucket"))
    # queries carry their vector through the bucket join: the rerank then
    # needs NO further joins — the cosine is computable on the joined row,
    # and duplicate pairs (collisions in several tables) collapse in one
    # distinct (the rounded cosine is identical on every duplicate).
    q = eb.where(query_filter).select(
        F.col("vec_id").alias("query_id"),
        F.col("t").alias("qt"),
        F.col("bucket").alias("qbucket"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    # MEASURED AND REJECTED (r14): dedup-pair-ids-first-then-join-back
    # (narrow distinct on (query_id, vec_id), one cosine per unique pair
    # instead of per table collision) read sf1 1.12 -> 1.03 (-8%) but
    # sf10 1.48 -> 1.59 (+7%) interleaved — the join-back shuffle costs
    # more at scale than the duplicate interpreted cosines it saves, and
    # -8% is under the 25% adoption bar. The compute-then-distinct form
    # stands.
    pairs = (
        F.broadcast(q)
        .join(
            eb,
            (F.col("qt") == F.col("t"))
            & (F.col("qbucket") == F.col("bucket"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select(
            "query_id",
            "vec_id",
            F.round(
                V.cosine(F.col("qv"), F.col("v"), F.col("qn"), F.col("nrm")), 6
            ).alias("cosine"),
        )
        .distinct()
    )
    return _ranked(pairs, k)


def cosine_topk_lsh_multiprobe(
    emb: DataFrame,
    k: int = 5,
    query_filter: str = "vec_id < 10",
    n_planes: int = 4,
    n_tables: int = 4,
    probe_bits: int = 1,
) -> DataFrame:
    """Multi-probe sign-LSH (Lv et al., VLDB 2007): besides each query's own
    bucket, probe the buckets whose sign pattern differs in up to
    ``probe_bits`` hyperplanes — the buckets a true near neighbor most
    likely fell into when one marginal dot product flipped sign.

    Why at scale: recall bought by probing is ~free in *index* cost —
    probing J extra buckets per table replaces DOUBLING n_tables, so the
    stored index (and the candidate side of every join) stays half the
    size for similar recall. Only the QUERY side fans out (J+1 probe rows
    per table), and that side is the broadcast one. The probe set always
    contains the exact bucket, so multi-probe candidates are a superset of
    single-probe's at equal (J, L) — recall can only go up (pinned in
    tests/test_similarity.py).

    Probe generation is a bucket-id XOR against each single-bit mask — no
    re-hashing, no second kernel pass.
    """
    if probe_bits != 1:
        raise ValueError("only 1-bit probing implemented (J+1 probes/table)")
    e = _with_norms(emb)
    eb = e.withColumn(
        "bs", lsh_buckets_kernel(n_planes, n_tables)(F.col("v"))
    ).select("vec_id", "v", "nrm", F.posexplode("bs").alias("t", "bucket"))
    probe_masks = F.array(F.lit(0), *[F.lit(1 << j) for j in range(n_planes)])
    q = (
        eb.where(query_filter)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("t").alias("qt"),
            F.explode(F.transform(probe_masks, lambda m: F.col("bucket").bitwiseXOR(m)))
            .alias("qbucket"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
        )
    )
    pairs = (
        F.broadcast(q)
        .join(
            eb,
            (F.col("qt") == F.col("t"))
            & (F.col("qbucket") == F.col("bucket"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select(
            "query_id",
            "vec_id",
            F.round(
                V.cosine(F.col("qv"), F.col("v"), F.col("qn"), F.col("nrm")), 6
            ).alias("cosine"),
        )
        .distinct()
    )
    return _ranked(pairs, k)


def cosine_topk_gemm(
    emb: DataFrame,
    k: int = 5,
    query_filter: str = "vec_id < 10",
) -> DataFrame:
    """Brute-force top-k with an Arrow-batched blocked-GEMM kernel.

    Same semantics as :func:`cosine_topk`; different physical strategy for
    HIGH DIMS: instead of a per-row `aggregate(zip_with(...))` fold in
    codegen, each Arrow batch of candidates becomes a [batch x dim] numpy
    matrix multiplied against the broadcast [q x dim] query matrix — one
    BLAS call per batch, ~dim x fewer interpreter transitions. The query
    matrix rides inside the closure (driver-side collect of the SMALL query
    set only; candidates never leave executors). Output rows are per
    (candidate, query) partial top-k is then reduced by the same window
    rank as the exact operator.
    """
    import numpy as np
    import pandas as pd

    e = _with_norms(emb)
    q_rows = e.where(query_filter).select("vec_id", "v", "nrm").collect()
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    qm = np.array([r["v"] for r in q_rows], dtype=np.float64)  # [q, dim]
    qn = np.array([r["nrm"] for r in q_rows], dtype=np.float64)

    def kernel(batches):
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            cm = np.stack(pdf["v"].to_numpy())  # [batch, dim]
            cn = pdf["nrm"].to_numpy(dtype=np.float64)
            sims = (cm @ qm.T) / np.outer(cn, qn)  # [batch, q]
            b, qcount = sims.shape
            out = pd.DataFrame(
                {
                    "query_id": np.tile(q_ids, b),
                    "vec_id": np.repeat(ids, qcount),
                    "cosine": np.round(sims.ravel(), 6),
                }
            )
            yield out[out["query_id"] != out["vec_id"]]

    pairs = e.select("vec_id", "v", "nrm").mapInPandas(
        kernel, "query_id bigint, vec_id bigint, cosine double"
    )
    return _ranked(pairs, k)
