"""Connected components over candidate-pair graphs — the cluster-resolution
step that turns dedup PAIRS (operators/dedup.py emits (doc_id_1, doc_id_2))
into canonical groups: every document maps to the MIN doc id reachable
through any chain of near-duplicate links, and keep-one-per-cluster follows.

Algorithm: minimum-label propagation to fixpoint — each round every node
takes the min of its own label and its neighbors' labels. This is the
textbook Spark formulation (one equi-join + one groupBy-min per round, both
shuffling on node id so consecutive rounds reuse the same hash
partitioning); rounds needed = graph diameter, and near-dup clusters are
shallow (a handful of rounds). Per round the labels frame is
``localCheckpoint``-ed: without it the iterative plan nests joins
exponentially and planning time, not data, becomes the bottleneck — the
standard Spark-iteration idiom (MLlib does the same). For adversarial
long-chain graphs the large-star/small-star variant halves rounds; not
needed for dedup workloads, noted for parity with production CC.

Driver involvement per round is ONE scalar (the changed-label count used
as the convergence test); labels never leave the cluster.

Non-SQL-expressible in one query (iterative), but DuckDB's recursive CTE
computes the same min-reachable-label fixpoint for the oracle — so even
this operator gets a value-exact cross-engine check (registry
`dedup_clusters`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_id_1",
    dst: str = "doc_id_2",
    max_iter: int = 25,
) -> DataFrame:
    """-> (node, component) for every node appearing in ``edges``;
    ``component`` is the smallest node id reachable from ``node``."""
    a = edges.select(F.col(src).cast("bigint").alias("a"), F.col(dst).cast("bigint").alias("b"))
    # materialize the symmetrized edge set ONCE: `edges` is typically an
    # expensive lazy plan (minhash banding + self-join); without this every
    # propagation round would re-execute that whole lineage
    sym = (
        a.union(a.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        prop = sym.join(labels, sym["a"] == labels["node"]).select(
            F.col("b").alias("node"), F.col("comp")
        )
        new_labels = (
            labels.select("node", "comp")
            .union(prop)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(
                "node", F.col("comp").alias("component")
            ).orderBy("node")
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def connected_components_star(
    edges: DataFrame,
    src: str = "doc_id_1",
    dst: str = "doc_id_2",
    max_iter: int = 20,
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14 — public
    algorithm): converges in O(log diameter) rounds vs the propagation
    operator's O(diameter), the variant to reach for on adversarial
    long-chain graphs. Same contract as :func:`connected_components`.

    - large-star: every node points its LARGER neighbors at the minimum of
      its neighborhood (incl. itself) — hooks trees onto small labels
      without creating cycles.
    - small-star: every node and its smaller neighbors all re-point at the
      neighborhood minimum — flattens chains into stars.

    Each half-round is one groupBy(min) + one join, both hash-partitioned
    on the node id. Fixpoint = the directed edge set stops changing (two
    exceptAll counts — a few scalar jobs per round on the driver).
    """
    raw = edges.select(
        F.col(src).cast("bigint").alias("u"), F.col(dst).cast("bigint").alias("v")
    )
    # nodes captured BEFORE dropping self-loops: a node whose only edge is
    # (x, x) must still appear in the output (contract parity with
    # connected_components, which keeps it via its symmetrize path)
    nodes = (
        raw.select(F.col("u").alias("node"))
        .union(raw.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = (
        raw.where(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )  # orient large -> small
        .distinct()
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # large-star on the symmetrized graph
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
            # consumed twice (mins2 and the small join): materialize once
            .localCheckpoint(eager=True)
        )
        # small-star on the (large -> small) directed edges
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins2.select(F.col("u"), F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        changed = (
            small.exceptAll(e).limit(1).count() + e.exceptAll(small).limit(1).count()
        )
        e = small
        if changed == 0:
            # every node: its star label if it has one, else itself
            # (component minima and isolated/self-loop-only nodes)
            labeled = e.select(
                F.col("u").alias("node"), F.col("v").alias("component")
            )
            return (
                nodes.join(labeled, "node", "left")
                .select(
                    "node", F.coalesce("component", F.col("node")).alias("component")
                )
                .orderBy("node")
            )
    raise RuntimeError(f"star CC did not converge in {max_iter} rounds")


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iters: int = 10,
    damping: float = 0.85,
    round_to: int = 9,
) -> DataFrame:
    """Weighted PageRank by fixed-iteration power method -> (node, pr).

    The iterative-ranking complement to the connected-components pair:
    rank flows along out-edges in proportion to edge weight,
    ``pr = (1-d)/N + d * sum_in(pr_src * w/out_w)``. Node ids are left
    untyped (strings work — the driver instantiation ranks event types
    on the behavior transition graph).

    Spark shape per iteration: ONE equi-join of the (static,
    checkpointed) fraction table with the rank table on src + ONE
    groupBy(dst) sum + ONE left join back to the node set — all hash-
    partitioned on node ids, rank state is exactly N rows, and the plan
    lineage is cut per round (the localCheckpoint iteration idiom of
    :func:`connected_components`). Driver involvement: the single node
    count N.

    Determinism contract: ranks are rounded to ``round_to`` decimals
    after every iteration, so cross-engine float-summation noise
    (~1e-16 relative) is absorbed before it can compound — the same
    argument as the 6-decimal cosine ranking (operators/similarity.py).
    ``iters`` is FIXED, not convergence-tested: identical work in every
    engine. Dangling-node mass is dropped (the common simplified
    formulation; the oracle and the NumPy twin replicate it exactly).
    """
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        (F.col(weight) if weight else F.lit(1)).cast("double").alias("w"),
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("ow"))
    frac = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("ow")).alias("f"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:  # empty edge set: no nodes, not a division by zero
        return nodes.select("node", F.lit(0.0).alias("pr"))
    ranks = nodes.select(
        "node", F.round(F.lit(1.0) / n, round_to).alias("pr")
    ).localCheckpoint(eager=True)
    base = (1 - damping) / n
    for _ in range(iters):
        contrib = (
            frac.join(ranks, frac["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("f")).alias("c"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                F.round(
                    F.lit(base) + damping * F.coalesce(F.col("c"), F.lit(0.0)),
                    round_to,
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.orderBy("node")


def triangle_count(
    edges: DataFrame, src: str = "a", dst: str = "b"
) -> DataFrame:
    """Global triangle count of the undirected simple graph in ``edges``
    — the classic graph-quality diagnostic (triangle density of a
    near-dup candidate graph separates tight duplicate clusters from
    LSH noise).

    DEGREE-ORIENTED node-iterator, the shape that survives scale:
    every edge is oriented from its lower-(degree, node) endpoint to
    the higher one, which makes the orientation acyclic and bounds each
    node's out-degree by O(sqrt(|E|)) on any graph — the wedge
    (two-path) table the first self-join builds is therefore
    near-linear in |E| instead of sum(degree^2) (the hub blow-up a
    naive a<b orientation hits on skewed graphs). Two equi-joins total:
    wedges close against the oriented edge set. The count is
    orientation-invariant, so the SQL twin uses the naive a<b<c form —
    same number, independently derived.

    -> one row: (n_triangles BIGINT)

    The canonical edge list and the oriented edge list are each
    referenced several times downstream (``e`` by the degree table and
    the degree join; ``oriented`` by both wedge legs and the closing
    semi-join), and Catalyst gives no common-subexpression reuse across
    differently-keyed exchanges — without intervention every reference
    re-executes the ENTIRE upstream pipeline that produced ``edges``
    (for the registry's dedup_triangles that is the full MinHash-LSH
    candidate DAG, ~10 copies: measured r16, 30 parquet scans / 107
    Exchanges in the before-plan). Both frames are therefore persisted
    (guide §5: cache exactly when an intermediate is reused and
    recomputing it is expensive): they are O(|E|) rows of two/three
    ints — tiny next to the corpus at every scale — MEMORY_AND_DISK
    spills gracefully, and the cache lives inside one query evaluation
    (recomputed from source per invocation; the ContextCleaner drops it
    when the DataFrames are collected)."""
    from pyspark import StorageLevel

    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).cast("bigint").alias("u"),
            F.greatest(F.col(src), F.col(dst)).cast("bigint").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = (
        e.select(F.col("u").alias("n")).unionAll(e.select("v"))
        .groupBy("n").agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.withColumnsRenamed({"n": "u", "d": "du"})
    dv = deg.withColumnsRenamed({"n": "v", "d": "dv"})
    ed = e.join(du, "u").join(dv, "v")
    # orient lower (degree, node) -> higher: acyclic, out-degree-bounded
    oriented = ed.select(
        F.when(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
            F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
        )
        .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
        .alias("e")
    ).select("e.s", "e.t").persist(StorageLevel.MEMORY_AND_DISK)
    w1 = oriented.withColumnsRenamed({"s": "x", "t": "y"})
    w2 = oriented.withColumnsRenamed({"s": "x2", "t": "z"})
    wedges = w1.join(w2, F.col("y") == F.col("x2")).select("x", "y", "z")
    closer = oriented.withColumnsRenamed({"s": "x", "t": "z"})
    tri = wedges.join(closer, ["x", "z"], "left_semi")
    # both cached frames feed the returned plan — tag them so callers
    # can release deterministically after the count action (r17,
    # VERDICT r16 #3; long-lived sessions otherwise accumulate dead
    # O(|E|) cache generations between GC cycles)
    from compute_histogram_spark.session import defer_release

    return defer_release(
        tri.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles")),
        e,
        oriented,
    )
