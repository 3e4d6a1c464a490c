"""A/B session-conf variants over the sf1 mid-tier HEADLINE rows
(VERDICT r15 #4: the sf1 gate rides on ~26 x 0.3-0.7 s of per-query
constant; find conf-level shavings with zero plan impact).

Usage: python tools/ab_conf_r16.py <variant> [sf_dir]
Variants: base | ui_off | kryo | no_constraint | combo
One variant per process (fresh JVM), warm min-of-3 per query.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "base": {},
    "ui_off": {
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
    },
    "kryo": {
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    },
    "no_constraint": {
        "spark.sql.constraintPropagation.enabled": "false",
    },
    "combo": {
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        "spark.sql.constraintPropagation.enabled": "false",
    },
}

ROWS = [
    "local_supplier_revenue", "shipping_priority", "rollup_revenue",
    "late_order_priority", "histogram_deciles", "event_transitions",
    "region_revenue", "histogram_log", "range_band_join", "corpus_pipeline",
]


def main():
    variant = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    from compute_histogram_spark.session import get_session
    from compute_histogram_spark import registry
    from bench import LOCAL_QUERIES, materialize

    spark = get_session("ab_conf", extra_conf=VARIANTS[variant])
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in ROWS:
        fn = LOCAL_QUERIES.get(name) or registry.QUERIES[name]
        materialize(fn(spark, sf_dir))  # cold / codegen warm
        ts = []
        for _ in range(3):
            t0 = time.monotonic()
            materialize(fn(spark, sf_dir))
            ts.append(time.monotonic() - t0)
        out[name] = round(min(ts), 3)
    print(json.dumps({"variant": variant, "total": round(sum(out.values()), 3),
                      "queries": out}))


if __name__ == "__main__":
    main()
