"""r13 Q16 A/B: the largest TPC-H sf10 row (10.4 s vs DuckDB 1.2).

The incumbent (relational.supplier_part_counts) shuffles the fact twice:
once to SMJ with the 2M-row part dim (the ONE star where the part side
cannot broadcast — brand<>-filtered part is ~80 MB), and once carrying
(p_brand, p_type, p_size, l_suppkey) — ~50 wide bytes/row — into the
two-level count-distinct expansion.

Variants, value-checked before timing:

- B "shuffle_hash": SHUFFLE_HASH hint on the part side — skips both
  SMJ sorts (the Q5 lesson applied to the partkey star).
- C "class_id": the (brand, type, size) class space is bounded
  (O(brands x types x sizes), not data-scaled) — broadcast a dense
  int class_id onto part, so the distinct shuffle moves two ints
  instead of strings; classes re-attached to the counts via the same
  broadcast at the end. Combined with SHUFFLE_HASH.

Usage: python tools/ab_q16_r13.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from compute_histogram_spark.session import autoscale_shuffle, get_session
from compute_histogram_spark.sources.tables import load
from compute_histogram_spark.operators import relational as R


def q16_shuffle_hash(spark, sf_dir):
    lineitem = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    part = load(spark, sf_dir, "part")
    bad = supplier.where(F.col("s_acctbal") < 1000.0).select("s_suppkey")
    p = part.where(F.col("p_brand") != "Brand#1").select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    j = lineitem.select("l_partkey", "l_suppkey").join(
        bad, lineitem["l_suppkey"] == bad["s_suppkey"], "left_anti"
    ).join(p.hint("SHUFFLE_HASH"), F.col("l_partkey") == p["p_partkey"])
    return (
        j.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q16_class_id(spark, sf_dir):
    lineitem = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    part = load(spark, sf_dir, "part")
    bad = supplier.where(F.col("s_acctbal") < 1000.0).select("s_suppkey")
    p = part.where(F.col("p_brand") != "Brand#1").select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    classes = (
        p.select("p_brand", "p_type", "p_size")
        .distinct()
        .withColumn(
            "class_id",
            F.xxhash64("p_brand", "p_type", "p_size"),
        )
    )
    p_id = p.join(
        F.broadcast(classes),
        ["p_brand", "p_type", "p_size"],
    ).select("p_partkey", "class_id")
    j = lineitem.select("l_partkey", "l_suppkey").join(
        bad, lineitem["l_suppkey"] == bad["s_suppkey"], "left_anti"
    ).join(p_id.hint("SHUFFLE_HASH"), F.col("l_partkey") == p_id["p_partkey"])
    counts = j.groupBy("class_id").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )
    return (
        counts.join(F.broadcast(classes), "class_id")
        .select("p_brand", "p_type", "p_size", "supplier_cnt")
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_session("ab-q16-r13")
    autoscale_shuffle(spark, sf_dir)

    def incumbent():
        return R.supplier_part_counts(
            load(spark, sf_dir, "lineitem"),
            load(spark, sf_dir, "supplier"),
            load(spark, sf_dir, "part"),
        )

    variants = {
        "incumbent": incumbent,
        "shuffle_hash": lambda: q16_shuffle_hash(spark, sf_dir),
        "class_id": lambda: q16_class_id(spark, sf_dir),
    }

    base = [tuple(r) for r in incumbent().collect()]
    for name, fn in variants.items():
        got = [tuple(r) for r in fn().collect()]
        assert got == base, f"{name} value mismatch ({len(got)} vs {len(base)})"
    print("value-exact across variants", flush=True)

    times = {k: [] for k in variants}
    for _ in range(rounds):
        for name, fn in variants.items():  # interleaved
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            times[name].append(round(time.time() - t0, 3))
    print(json.dumps({
        "sf_dir": sf_dir,
        "min": {k: min(v) for k, v in times.items()},
        "all": times,
    }))


if __name__ == "__main__":
    main()
