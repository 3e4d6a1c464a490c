"""r12 scan-agg class A/B: one measured alternative per remaining
weak-class query (VERDICT r11 #2 rubric — each >1 s sf10 row needs a
measured sf100 ratio + a measured-and-rejected (or adopted) alternative).

Alternatives measured here, all value-checked against the incumbent
before timing:

- pricing_summary  -> Arrow partial-aggregation kernel (per-batch numpy
  groupby on the 6-group key, bigint partials; final tiny agg) — the
  doc_fingerprint/text_stats playbook pointed at Q1's scan+agg.
- corpus_pipeline  -> the interpreted-HOF stopword filter replaced by
  an Arrow token/stopword kernel over the deduped texts (HOF tax memo).
- cohort_retention -> the countDistinct formulation (the one the
  incumbent deliberately avoids) — measured so the avoidance is priced.
- event_transitions-> Arrow lead kernel over repartition+sortWithin
  (kills the JVM window's per-row overhead; partition boundary = user).

Usage: python tools/ab_scanagg_r12.py [sf_dir] [rounds] [names...]
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
from compute_histogram_spark.sources.tables import load
from compute_histogram_spark import registry
import bench as B


# --- pricing_summary: Arrow partial-agg kernel ---------------------------

def pricing_summary_arrow(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    ).select(
        "l_returnflag", "l_linestatus",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    )

    def kernel(batches):
        for pdf in batches:
            qc = np.rint(pdf["l_quantity"].values * 100).astype(np.int64)
            pc = np.rint(pdf["l_extendedprice"].values * 100).astype(np.int64)
            dc = np.rint(pdf["l_discount"].values * 100).astype(np.int64)
            tc = np.rint(pdf["l_tax"].values * 100).astype(np.int64)
            disc = pc * (100 - dc)
            charge = disc * (100 + tc)
            key = (pdf["l_returnflag"].astype(str) + "|"
                   + pdf["l_linestatus"].astype(str)).values
            uk, inv = np.unique(key, return_inverse=True)
            m = len(uk)
            out = {
                "k": uk,
                "sq": np.bincount(inv, qc, m).astype(np.int64),
                "sp": np.bincount(inv, pc, m).astype(np.int64),
                "sd": np.bincount(inv, disc, m).astype(np.int64),
                "sc": np.bincount(inv, charge, m).astype(np.int64),
                "sdc": np.bincount(inv, dc, m).astype(np.int64),
                "n": np.bincount(inv, minlength=m).astype(np.int64),
            }
            yield pd.DataFrame(out)

    partial = li.mapInPandas(
        kernel,
        "k string, sq long, sp long, sd long, sc long, sdc long, n long",
    )
    agg = partial.groupBy("k").agg(
        F.sum("sq").alias("sq"), F.sum("sp").alias("sp"),
        F.sum("sd").alias("sd"), F.sum("sc").alias("sc"),
        F.sum("sdc").alias("sdc"), F.sum("n").alias("n"),
    )
    return agg.select(
        F.split_part("k", F.lit("|"), F.lit(1)).alias("l_returnflag"),
        F.split_part("k", F.lit("|"), F.lit(2)).alias("l_linestatus"),
        (F.col("sq") / 100.0).alias("sum_qty"),
        (F.col("sp") / 100.0).alias("sum_base_price"),
        (F.col("sd") / 10000.0).alias("sum_disc_price"),
        (F.col("sc") / 1000000.0).alias("sum_charge"),
        (F.col("sq") / F.col("n") / 100.0).alias("avg_qty"),
        (F.col("sp") / F.col("n") / 100.0).alias("avg_price"),
        (F.col("sdc") / F.col("n") / 100.0).alias("avg_disc"),
        F.col("n").alias("count_order"),
    ).orderBy("l_returnflag", "l_linestatus")


# --- cohort_retention: the countDistinct form ----------------------------

def cohort_retention_cd(spark, sf_dir):
    from compute_histogram_spark.operators.behavior import _week_key

    events = load(spark, sf_dir, "events")
    am = events.select("user_id", _week_key(events)).distinct()
    first = am.groupBy("user_id").agg(F.min("wk").alias("cwk"))
    j = am.join(first, "user_id")
    return (
        j.groupBy("cwk", "wk")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select(
            (F.col("cwk") * 7 * 86_400).alias("cohort_week_start_s"),
            (F.col("wk") - F.col("cwk")).cast("int").alias("week_offset"),
            "n_users",
        )
        .orderBy("cohort_week_start_s", "week_offset")
    )


# --- event_transitions: Arrow lead kernel --------------------------------

def event_transitions_arrow(spark, sf_dir):
    from compute_histogram_spark.operators.behavior import ts_micros

    events = load(spark, sf_dir, "events")
    src = events.select(
        "user_id", "event_type",
        ts_micros(events).alias("tsu"), "event_id",
    ).repartition("user_id").sortWithinPartitions(
        "user_id", "tsu", "event_id"
    )

    def kernel(batches):
        # partition-local lead: rows arrive sorted by (user, tsu, id);
        # carry the boundary row between batches of the same partition
        prev_u = prev_t = None
        for pdf in batches:
            u = pdf["user_id"].values
            t = pdf["event_type"].values
            if len(u) == 0:
                continue
            if prev_u is not None:
                u = np.concatenate(([prev_u], u))
                t = np.concatenate(([prev_t], t))
            frm = t[:-1]
            to = t[1:]
            same = u[:-1] == u[1:]
            if same.any():
                yield pd.DataFrame({"from_type": frm[same], "to_type": to[same]})
            prev_u, prev_t = u[-1], t[-1]

    pairs = src.mapInPandas(kernel, "from_type string, to_type string")
    return (
        pairs.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("from_type", "to_type")
    )


# --- corpus_pipeline: Arrow stopword kernel ------------------------------

def corpus_pipeline_arrow(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    kept = docs.groupBy(F.sha2("text", 256).alias("h"), "lang").agg(
        F.min("doc_id").alias("doc_id"),
        F.first("text").alias("text"),
        F.count(F.lit(1)).alias("n_copies"),
    ).select("lang", "n_copies", "text")

    STOP = {"the", "a", "of", "and", "in", "to"}

    def kernel(batches):
        for pdf in batches:
            langs, copies, texts = (
                pdf["lang"].values, pdf["n_copies"].values, pdf["text"].values
            )
            n_tok = np.empty(len(texts), np.int64)
            n_stop = np.empty(len(texts), np.int64)
            n_chars = np.empty(len(texts), np.int64)
            for i, s in enumerate(texts):
                toks = s.split(" ")
                n_tok[i] = len(toks)
                n_stop[i] = sum(1 for x in toks if x in STOP)
                n_chars[i] = len(s)
            yield pd.DataFrame({
                "lang": langs, "n_copies": copies, "n_chars": n_chars,
                "n_tokens": n_tok, "n_stop": n_stop,
            })

    q = kept.mapInPandas(
        kernel,
        "lang string, n_copies long, n_chars long, n_tokens long, n_stop long",
    ).withColumn(
        "stopword_ratio", F.round(F.col("n_stop") * 1.0 / F.col("n_tokens"), 6)
    )
    f = q.where((F.col("n_tokens") >= 5) & (F.col("stopword_ratio") <= 0.5))
    return (
        f.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("n_copies") - F.count(F.lit(1))).alias("n_dupes_removed"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


PAIRS = {
    "pricing_summary": pricing_summary_arrow,
    "cohort_retention": cohort_retention_cd,
    "event_transitions": event_transitions_arrow,
    "corpus_pipeline": corpus_pipeline_arrow,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3:] or list(PAIRS)
    spark = get_session("ab-scanagg-r12")
    spark.sparkContext.setLogLevel("ERROR")
    autoscale_shuffle(spark, sf_dir)

    out: dict = {"sf_dir": sf_dir, "queries": {}}
    for name in names:
        base_fn = B.LOCAL_QUERIES.get(name) or registry.QUERIES[name]
        alt_fn = PAIRS[name]
        base, alt = base_fn(spark, sf_dir), alt_fn(spark, sf_dir)
        # value check: identical rows (sorted plans on both sides)
        bp = base.toPandas().round(6)
        ap = alt.toPandas().round(6)
        same = bp.reset_index(drop=True).equals(
            ap[bp.columns].reset_index(drop=True)
        )
        row = {"values_match": bool(same), "base": [], "alt": []}
        if not same:
            print(name, "VALUE MISMATCH", flush=True)
            out["queries"][name] = row
            continue
        B.materialize(base); B.materialize(alt)  # cold
        for _ in range(rounds):
            t0 = time.time(); B.materialize(base)
            row["base"].append(round(time.time() - t0, 3))
            t0 = time.time(); B.materialize(alt)
            row["alt"].append(round(time.time() - t0, 3))
        row["min_base"], row["min_alt"] = min(row["base"]), min(row["alt"])
        out["queries"][name] = row
        print(name, row, flush=True)
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "ab_scanagg_r12.json"), "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
