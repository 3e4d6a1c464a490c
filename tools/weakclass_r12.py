"""r12 weak-class adjudication harness (VERDICT r11 #2): the nine sf10
scan-agg/star rows that read >1 s and >2x vs the comparator in r11.

For each query: interleaved rounds of (Spark raw plan, Spark layout
variant where one exists, DuckDB) — per-engine min over rounds, one
process, same box minute, so the A/B is noise-fair (BASELINE.md bench
protocol). Results -> tools/weakclass_r12.json; the adjudication memo
lands in BASELINE.md.

Usage: python tools/weakclass_r12.py [sf_dir] [rounds]
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
    # (name, layout variant name or None)
    ("local_supplier_revenue", "local_supplier_revenue_layout"),
    ("shipping_priority", "shipping_priority_layout"),
    ("late_order_priority", "late_order_priority_layout"),
    ("region_revenue", "region_revenue_layout"),
    ("rollup_revenue", "rollup_revenue_layout"),
    ("pricing_summary", None),
    ("event_transitions", None),
    ("cohort_retention", None),
    ("corpus_pipeline", None),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = get_session("weakclass-r12")
    spark.sparkContext.setLogLevel("ERROR")
    autoscale_shuffle(spark, sf_dir)

    con = duckdb.connect()
    from compute_histogram_spark.sources.tables import TABLES
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    def spark_fn(name):
        return B.LOCAL_QUERIES.get(name) or registry.QUERIES[name]

    def run_spark(name):
        t0 = time.time()
        B.materialize(spark_fn(name)(spark, sf_dir))
        return time.time() - t0

    def run_duck(sql):
        t0 = time.time()
        con.execute(sql).fetchall()
        return time.time() - t0

    out: dict = {"sf_dir": sf_dir, "rounds": rounds, "queries": {}}
    # cold pass (untimed): materialize everything once, build layouts
    for name, layout in QUERIES:
        run_spark(name)
        if layout:
            run_spark(layout)
        sql = registry.ORACLES.get(name) or B.LOCAL_ORACLES.get(name)
        run_duck(sql)
        out["queries"][name] = {"spark": [], "layout": [], "duckdb": []}

    for _ in range(rounds):
        for name, layout in QUERIES:
            row = out["queries"][name]
            row["spark"].append(round(run_spark(name), 3))
            if layout:
                row["layout"].append(round(run_spark(layout), 3))
            sql = registry.ORACLES.get(name) or B.LOCAL_ORACLES.get(name)
            row["duckdb"].append(round(run_duck(sql), 3))
            print(name, row, flush=True)
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "weakclass_r12.json"), "w") as f:
                json.dump(out, f, indent=1)

    print("--- mins ---")
    for name, _ in QUERIES:
        row = out["queries"][name]
        mins = {k: min(v) for k, v in row.items() if v}
        print(name, mins)


if __name__ == "__main__":
    main()
