"""CBO join-reorder experiment (VERDICT r06 #6).

Question: with table+column statistics available, does Catalyst's cost-based
optimizer find the selectivity-first Q5 join order on its own — the order
`relational.local_supplier_revenue` hand-writes because the stats-less
planner can't reorder joins?

Method: a fresh session with `spark.sql.cbo.enabled` +
`spark.sql.cbo.joinReorder.enabled`, the sf1 tiled tables registered as
EXTERNAL catalog tables (`CREATE TABLE ... USING parquet LOCATION`) and
`ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS`, then TPC-H Q5
written in the NAIVE declarative order (the order a user types, facts
first) as plain SQL. We record:

  1. the join order CBO picks for the naive SQL (from the optimized plan),
  2. the same naive SQL with CBO off (the stats-less order — baseline),
  3. wall-clock for naive+CBO vs naive-noCBO vs the hand-ordered
     DataFrame plan, interleaved min-of-N.

Run: python tools/cbo_experiment.py [sf_dir] (default /tmp/sf1; build it
with tools/make_scale.py first). Results land in BASELINE.md prose — this
tool is evidence, not a gate. plan_audit continues to run WITHOUT CBO
(the production session doesn't enable it; see conclusion in BASELINE.md).
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import SparkSession  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "orders", "lineitem"]

# The naive order: facts joined as a user lists them in the FROM clause.
NAIVE_Q5 = """
SELECT n_name,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0
           AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


def join_order(df) -> list[str]:
    """Leaf-relation order of the optimized logical plan (left-to-right)."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # catalog scans print as `Relation spark_catalog.default.lineitem[...]`
    # or `Relation default.lineitem[...]`; path-based parquet reads carry
    # no table name, so fall back to the first column's `x_` prefix
    names = re.findall(r"Relation [^\[ ]*?([a-z_]+)\[", plan)
    if names:
        return names
    prefix_to_table = {
        "l": "lineitem", "o": "orders", "c": "customer",
        "s": "supplier", "n": "nation", "r": "region", "p": "part",
    }
    return [
        prefix_to_table.get(m, m)
        for m in re.findall(r"Relation ?\[([a-z])_[a-z_]+#", plan)
    ]


def timed(df, n=3) -> float:
    times = []
    for _ in range(n):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    return round(min(times), 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    warehouse = "/tmp/cbo_warehouse"
    spark = (
        SparkSession.builder.appName("cbo_experiment")
        .master(os.environ.get("SPARK_GRAFT_CPUS", "local[32]")
                if "local" in os.environ.get("SPARK_GRAFT_CPUS", "local[32]")
                else f"local[{os.environ['SPARK_GRAFT_CPUS']}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.cbo.joinReorder.enabled", "true")
        .config("spark.sql.statistics.histogram.enabled", "true")
        .config("spark.sql.warehouse.dir", warehouse)
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    for t in TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(
            f"CREATE TABLE {t} USING parquet LOCATION '{sf_dir}/{t}.parquet'"
        )
    t0 = time.time()
    for t in TABLES:
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR ALL COLUMNS")
    print(f"analyze: {time.time() - t0:.1f}s for {len(TABLES)} tables")

    cbo_df = spark.sql(NAIVE_Q5)
    print("naive SQL + CBO join order:   ", join_order(cbo_df))

    spark.conf.set("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    nocbo_df = spark.sql(NAIVE_Q5)
    print("naive SQL - CBO join order:   ", join_order(nocbo_df))
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")

    from compute_histogram_spark.operators.relational import (
        local_supplier_revenue,
    )

    hand = local_supplier_revenue(
        *[spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TABLES]
    )
    print("hand-ordered plan join order: ", join_order(hand))

    # interleaved timing
    for label, df in [("naive+cbo", cbo_df), ("hand", hand)]:
        df.write.format("noop").mode("overwrite").save()  # warm
    r = {}
    for label, df in [("naive+cbo", cbo_df), ("hand", hand)]:
        r[label] = timed(df)
    spark.conf.set("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    nocbo_df = spark.sql(NAIVE_Q5)
    nocbo_df.write.format("noop").mode("overwrite").save()
    r["naive-nocbo"] = timed(nocbo_df)
    print("warm min-of-3 seconds:", r)


if __name__ == "__main__":
    main()
