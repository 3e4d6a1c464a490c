"""doc_fingerprint at sf10, FIRST-POSITION on a fresh JVM (VERDICT r9 #4).

The driver sweep reads doc_fingerprint 3.1x at sf10 but it sits LAST in
the fixed HEADLINE order, i.e. carries the maximum JVM type-profile
aging tax (r9 root-cause: late-positioned rows overstate ~1.5x). This
tool measures the query EARLY — the very first real work the session
runs — interleaved with DuckDB, so the reading is aging-free. If the
fresh ratio is <= 2x, the sweep's 3.1x is an aging artifact per the r9
protocol rule; record both in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/sf10")


def main():
    import duckdb

    from compute_histogram_spark import registry
    from compute_histogram_spark.session import get_session

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    sys.path.insert(0, repo)
    import importlib

    bench = importlib.import_module("bench")

    name = "doc_fingerprint"
    fn = registry.QUERIES.get(name) or bench.LOCAL_QUERIES[name]
    sql = registry.ORACLES.get(name) or bench.LOCAL_ORACLES[name]

    spark = get_session("ab-fp10")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    from compute_histogram_spark.sources.tables import TABLES

    for t in TABLES:
        p = os.path.join(SF10, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    def mat():
        fn(spark, SF10).write.format("noop").mode("overwrite").save()

    s_times, d_times = [], []
    mat()  # cold (untimed, parquet footer + codegen)
    con.execute(sql).fetchall()
    for _ in range(4):
        t0 = time.time(); mat(); s_times.append(round(time.time() - t0, 3))
        t0 = time.time(); con.execute(sql).fetchall()
        d_times.append(round(time.time() - t0, 3))
    print(json.dumps({
        "query": name, "sf_dir": SF10, "position": "first-on-fresh-jvm",
        "spark_min": min(s_times), "duckdb_min": min(d_times),
        "ratio": round(min(s_times) / min(d_times), 3),
        "spark_all": s_times, "duckdb_all": d_times,
    }))


if __name__ == "__main__":
    main()
