"""r13 corpus_pipeline A/B: the dedup key shape.

The incumbent (registry.q_corpus_pipeline) groups on (sha2(text), lang)
and carries first(text) through the shuffle to compute per-distinct-text
stats afterward. Two alternatives, value-checked against the incumbent
before timing:

- B "group_by_text": groupBy(text, lang) directly — the map-side hash
  aggregate combines duplicates exactly like the sha2 form (shuffle moves
  distinct texts either way, as first(text) already did), but skips the
  sha2-256 pass over every input byte.
- C "stats_first": per-doc stats computed map-side BEFORE the dedup
  groupBy, so the shuffle carries (sha2, lang, 3 ints) and never any
  text. Costs stats-per-doc instead of stats-per-distinct — wins when
  dup rates are low (real crawls), loses CPU when the corpus is
  dup-heavy (the tiled bench data is 100% dup-heavy by construction,
  so this prices the trade's worst case).

Usage: python tools/ab_corpus_r13.py [sf_dir] [rounds]
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
from compute_histogram_spark.registry import q_corpus_pipeline

STOP = ("the", "a", "of", "and", "in", "to")


def _stats_cols(t_col="t"):
    stop = F.array([F.lit(w) for w in STOP])
    return [
        F.size(t_col).alias("n_tokens"),
        F.round(
            F.size(F.filter(t_col, lambda x: F.array_contains(stop, x)))
            * 1.0 / F.size(t_col), 6,
        ).alias("stopword_ratio"),
    ]


def _finish(f):
    return (
        f.where((F.col("n_tokens") >= 5) & (F.col("stopword_ratio") <= 0.5))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("n_copies") - F.count(F.lit(1))).alias("n_dupes_removed"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


def corpus_group_by_text(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    kept = docs.groupBy("text", "lang").agg(
        F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies")
    )
    toks = kept.select(
        "lang", "n_copies", F.split("text", " ").alias("t"),
        F.length("text").alias("n_chars"),
    )
    return _finish(toks.select("lang", "n_copies", "n_chars", *_stats_cols()))


def corpus_stats_first(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    per_doc = docs.select(
        F.sha2("text", 256).alias("h"), "lang",
        "doc_id", F.length("text").alias("n_chars"),
        *_stats_cols(F.split("text", " ")),
    )
    kept = per_doc.groupBy("h", "lang").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.first("n_chars").alias("n_chars"),
        F.first("n_tokens").alias("n_tokens"),
        F.first("stopword_ratio").alias("stopword_ratio"),
    )
    return _finish(kept)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_session("ab-corpus-r13")
    autoscale_shuffle(spark, sf_dir)

    variants = {
        "incumbent_sha2": lambda: q_corpus_pipeline(spark, sf_dir),
        "group_by_text": lambda: corpus_group_by_text(spark, sf_dir),
        "stats_first": lambda: corpus_stats_first(spark, sf_dir),
    }

    base = [tuple(r) for r in variants["incumbent_sha2"]().collect()]
    for name, fn in variants.items():
        got = [tuple(r) for r in fn().collect()]
        assert got == base, f"{name} value mismatch"
    print("value-exact across variants", flush=True)

    times = {k: [] for k in variants}
    for _ in range(rounds):
        for name, fn in variants.items():  # interleaved
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            times[name].append(round(time.time() - t0, 3))
    out = {
        "sf_dir": sf_dir,
        "min": {k: min(v) for k, v in times.items()},
        "all": times,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
