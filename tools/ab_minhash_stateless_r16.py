"""A/B: MinHash-LSH candidate pairs with the aggregated signature
(shingle explode -> groupBy(doc_id) k-min -> band join; TWO shuffles)
vs the stateless array-HOF signature (dedup.band_rows_stateless:
array_min over transformed shingle arrays, ZERO signature shuffle;
the band join is the only exchange).

The stateless form was built for the streaming twin (one stateful agg
allowed); if it also wins in batch, minhash_candidates should adopt it
— the signature groupBy moves O(docs x shingles) (doc_id, s) rows today.

Usage: python tools/ab_minhash_stateless_r16.py <agg|stateless|verify> [sf_dir]
One variant per process (fresh JVM), warm min-of-3.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def candidates_stateless(docs):
    """minhash_candidates with band_rows_stateless as the substrate."""
    from compute_histogram_spark.operators.dedup import band_rows_stateless

    long = band_rows_stateless(docs)
    a, b = long.alias("a"), long.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("b.doc_id").alias("doc_id_2"),
        )
        .repartition(F.col("doc_id_1"), F.col("doc_id_2"))
        .distinct()
        .orderBy("doc_id_1", "doc_id_2")
    )


def main() -> None:
    variant = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"

    from compute_histogram_spark.operators.dedup import minhash_candidates
    from compute_histogram_spark.session import get_session

    spark = get_session("ab_minhash_stateless")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    if variant == "verify":
        a = minhash_candidates(docs).collect()
        b = candidates_stateless(docs).collect()
        same = [tuple(r) for r in a] == [tuple(r) for r in b]
        print(json.dumps({"variant": "verify", "sf_dir": sf_dir,
                          "pairs": len(a), "equal": same}))
        if not same:
            sys.exit(1)
        return

    fn = {"agg": minhash_candidates, "stateless": candidates_stateless}[variant]
    fn(docs).count()  # warm: JIT + page cache
    times = []
    for _ in range(3):
        t0 = time.time()
        n = fn(docs).count()
        times.append(time.time() - t0)
    print(json.dumps({"variant": variant, "sf_dir": sf_dir, "pairs": n,
                      "warm_min_s": round(min(times), 3),
                      "times": [round(t, 3) for t in times]}))


if __name__ == "__main__":
    main()
