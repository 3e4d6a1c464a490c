"""r13 weak-class re-probe: the eight adjudicated >2x rows re-measured
at the largest scale with this round's adopted forms — the user_id
events layout behind cohort_retention / event_transitions, the Q16
class-id rewrite, and the Q5 SHUFFLE_HASH fact join — so the
largest-scale evidence reflects the shipped plans.

Same protocol as tools/weakclass_r12.py: interleaved rounds of
(Spark raw, Spark layout variant where one exists, DuckDB), per-engine
min over rounds, one process. Results -> tools/weakclass_r13.json.

sf100 NOTE (the r12 lesson, re-learned here): this warm multi-query
protocol OOMs the default 8 GB JVM at sf100 — the Q5 layout WRITE died
mid-cold-pass on this box. At that scale (a) pre-build the write-once
layouts in an ingest-sized heap (SPARK_GRAFT_DRIVER_MEM=24g; they
re-register from _SUCCESS-marked files afterwards), then (b) use
tools/scale_probe.py --cold for the honest fresh-JVM readings.

Usage: python tools/weakclass_r13.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from compute_histogram_spark.session import autoscale_shuffle, get_session
from compute_histogram_spark import registry
import bench as B

QUERIES = [
    # (name, layout/adopted variant name or None)
    ("local_supplier_revenue", "local_supplier_revenue_layout"),
    ("shipping_priority", "shipping_priority_layout"),
    ("region_revenue", "region_revenue_layout"),
    ("rollup_revenue", "rollup_revenue_layout"),
    ("pricing_summary", None),
    ("event_transitions", "event_transitions_layout"),
    ("cohort_retention", "cohort_retention_layout"),
    ("corpus_pipeline", None),
    ("supplier_part_counts", None),  # Q16 post class-id adoption
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = get_session("weakclass-r13")
    spark.sparkContext.setLogLevel("ERROR")
    autoscale_shuffle(spark, sf_dir)

    con = duckdb.connect()
    from compute_histogram_spark.sources.tables import TABLES
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    def spark_fn(name):
        if name == "supplier_part_counts":
            return registry.q_supplier_part_counts
        return B.LOCAL_QUERIES.get(name) or registry.QUERIES[name]

    def oracle(name):
        if name == "supplier_part_counts":
            return registry.SUPPLIER_PART_COUNTS_ORACLE
        return registry.ORACLES.get(name) or B.LOCAL_ORACLES.get(name)

    def run_spark(name):
        t0 = time.time()
        B.materialize(spark_fn(name)(spark, sf_dir))
        return time.time() - t0

    def run_duck(sql):
        t0 = time.time()
        con.execute(sql).fetchall()
        return time.time() - t0

    out: dict = {"sf_dir": sf_dir, "rounds": rounds, "queries": {}}
    for name, layout in QUERIES:  # cold pass (untimed); builds layouts
        run_spark(name)
        if layout:
            run_spark(layout)
        run_duck(oracle(name))
        out["queries"][name] = {"spark": [], "layout": [], "duckdb": []}

    for _ in range(rounds):
        for name, layout in QUERIES:
            row = out["queries"][name]
            row["spark"].append(round(run_spark(name), 3))
            if layout:
                row["layout"].append(round(run_spark(layout), 3))
            row["duckdb"].append(round(run_duck(oracle(name)), 3))
            print(name, row, flush=True)
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "weakclass_r13.json"), "w") as f:
                json.dump(out, f, indent=1)

    print("--- mins ---")
    for name, _ in QUERIES:
        row = out["queries"][name]
        mins = {k: min(v) for k, v in row.items() if v}
        print(name, mins)


if __name__ == "__main__":
    main()
