"""Interleaved A/B: dedup_minhash at sf1 — band self-join strategy
(VERDICT r9 #5: 1.26 -> 1.40 s across rounds, no documented floor yet).

Variants, all value-identical (asserted on pair counts):
  base     — current plan (SMJ or whatever Catalyst picks)
  shash    — SHUFFLE_HASH hint on the band self-join (kills both sort
             legs; scale-correct, unlike broadcasting a corpus-sized
             band table)
  nofinal  — base without the final global orderBy (isolates the sort
             tax; NOT a shippable variant, diagnostic only)

Interleaved ABAB x n rounds on a fresh session (memory: box noise is
1.5-2x, interleave and take mins).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from compute_histogram_spark.operators import dedup as DD  # noqa: E402
from compute_histogram_spark.session import get_session  # noqa: E402
from compute_histogram_spark.sources.tables import load  # noqa: E402

SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")


def base(spark):
    return DD.minhash_candidates(load(spark, SF1, "documents"))


def shash(spark):
    docs = load(spark, SF1, "documents")
    sig = DD.minhash_signatures(
        DD.shingle_table(docs, n=3, distinct=False), 8
    )
    long = DD._band_long(sig, 8, 2)
    a, b = long.alias("a"), long.hint("SHUFFLE_HASH").alias("b")
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


def nofinal(spark):
    docs = load(spark, SF1, "documents")
    sig = DD.minhash_signatures(
        DD.shingle_table(docs, n=3, distinct=False), 8
    )
    long = DD._band_long(sig, 8, 2)
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
    )


def mat(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_session("ab-minhash")
    spark.sparkContext.setLogLevel("ERROR")
    variants = {"base": base, "shash": shash, "nofinal": nofinal}
    # value parity
    counts = {k: v(spark).count() for k, v in variants.items()}
    assert len(set(counts.values())) == 1, counts
    times = {k: [] for k in variants}
    for k, v in variants.items():  # warm each once
        mat(v(spark))
    for _ in range(5):
        for k, v in variants.items():
            t0 = time.time()
            mat(v(spark))
            times[k].append(round(time.time() - t0, 3))
    print(json.dumps({
        "n_pairs": counts["base"],
        "min": {k: min(v) for k, v in times.items()},
        "all": times,
    }))


if __name__ == "__main__":
    main()
