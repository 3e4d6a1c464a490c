"""r12 ngram-Jaccard endgame A/B (VERDICT r11 #5): one more lever on the
pair-count shuffle floor — IN-BATCH PAIR COMBINE. The Arrow kernel
currently emits every (d1, d2) occurrence and Spark's partial aggregation
does the map-side combine AFTER the Arrow -> JVM transfer; combining
inside the kernel (lexsort + run-length encode per batch) moves that
combine before the transfer, shrinking both the Arrow hand-off and the
shuffle input — IF the within-batch duplicate rate pays for the sort.

Interleaved min-of-3 in one session at sf10; results stdout + JSON.
Usage: python tools/ab_ngram_r12.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from compute_histogram_spark.session import autoscale_shuffle, get_session
from compute_histogram_spark.operators.dedup import (
    ngram_jaccard_pairs_arrow,
    shingle_table,
)
from compute_histogram_spark.sources.tables import load
import bench as B


def arrow_combined(docs, threshold=0.5, n=3):
    """ngram_jaccard_pairs_arrow with in-batch pair combining."""
    sh = shingle_table(docs, n=n, distinct=False).select(
        "doc_id", F.xxhash64("s").alias("h")
    )
    posts = sh.groupBy("h").agg(
        F.array_sort(F.collect_set("doc_id")).alias("ds")
    )
    posts = posts.select("ds").localCheckpoint(eager=False)
    sizes = (
        posts.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_sh"))
    )

    def kernel(batches):
        for pdf in batches:
            lists = pdf["ds"].values
            if not len(lists):
                continue
            ks = np.fromiter((len(x) for x in lists), np.int64, len(lists))
            flat = np.concatenate(lists).astype(np.int64, copy=False)
            starts = np.zeros(len(ks), np.int64)
            np.cumsum(ks[:-1], out=starts[1:])
            a_parts, b_parts = [], []
            for k in np.unique(ks):
                if k < 2:
                    continue
                iu, ju = np.triu_indices(k, 1)
                base = starts[ks == k]
                a_parts.append((base[:, None] + iu[None, :]).ravel())
                b_parts.append((base[:, None] + ju[None, :]).ravel())
            if not a_parts:
                continue
            a = flat[np.concatenate(a_parts)]
            b = flat[np.concatenate(b_parts)]
            # in-batch combine: lexsort + run-length encode
            order = np.lexsort((b, a))
            a, b = a[order], b[order]
            new = np.empty(len(a), bool)
            new[0] = True
            new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
            idx = np.flatnonzero(new)
            cnt = np.diff(np.append(idx, len(a))).astype(np.int64)
            yield pd.DataFrame({"d1": a[idx], "d2": b[idx], "c": cnt})

    pairs = (
        posts.where(F.size("ds") >= 2)
        .select("ds")
        .mapInPandas(kernel, "d1 bigint, d2 bigint, c bigint")
    )
    inter = pairs.groupBy("d1", "d2").agg(F.sum("c").alias("n_inter"))
    s1 = sizes.withColumnsRenamed({"doc_id": "d1", "n_sh": "n1"}).hint(
        "shuffle_hash"
    )
    s2 = sizes.withColumnsRenamed({"doc_id": "d2", "n_sh": "n2"}).hint(
        "shuffle_hash"
    )
    j1 = inter.join(s1, "d1").where(
        F.col("n_inter") >= (threshold - 1e-6) * F.col("n1")
    )
    return (
        j1.join(s2, "d2")
        .withColumn(
            "jaccard",
            F.round(
                (F.col("n_inter") * 1.0)
                / (F.col("n1") + F.col("n2") - F.col("n_inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col("d1").alias("doc_id_1"),
            F.col("d2").alias("doc_id_2"),
            "jaccard",
        )
        .orderBy("doc_id_1", "doc_id_2")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_session("ab-ngram-r12")
    spark.sparkContext.setLogLevel("ERROR")
    autoscale_shuffle(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")

    # equality first (cheap at sf0.01 semantics — here row counts + sample)
    base = ngram_jaccard_pairs_arrow(docs)
    comb = arrow_combined(docs)

    out = {"sf_dir": sf_dir, "base": [], "combined": []}
    B.materialize(base)  # cold
    B.materialize(comb)
    for _ in range(rounds):
        t0 = time.time(); B.materialize(base)
        out["base"].append(round(time.time() - t0, 2))
        t0 = time.time(); B.materialize(comb)
        out["combined"].append(round(time.time() - t0, 2))
        print(out, flush=True)
    nb, nc = base.count(), comb.count()
    out["rows"] = {"base": nb, "combined": nc}
    assert nb == nc, (nb, nc)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "ab_ngram_r12.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("mins:", min(out["base"]), min(out["combined"]), "rows", nb)


if __name__ == "__main__":
    main()
