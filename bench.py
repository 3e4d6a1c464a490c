"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per query: one cold run to materialize (noop sink — full execution, no
driver transfer), then three warm runs; the min warm time is reported
(steady-state throughput; min-of-3 damps AQE/scheduler/GC jitter, which is
large relative to sub-second queries at this scale). `value` is the sum.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from compute_histogram_spark.session import get_session
from compute_histogram_spark import registry

HEADLINE = [
    "histogram_linear",
    "histogram_log",
    "histogram_deciles",
    "pricing_summary",
    "top_customers",
    "region_revenue",
    "local_supplier_revenue",
    "shipping_priority",
    "late_order_priority",
    "histogram_incremental",
    "windowed_histogram",
    "sessionize",
    "conversion_funnel",
    "cohort_retention",
    "event_transitions",
    "asof_join",
    "range_band_join",
    "rollup_revenue",
    "dedup_exact",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "similarity_topk",
    "similarity_topk_lsh",
    "text_stats",
    "corpus_pipeline",
    "doc_fingerprint",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_session("bench")
    spark.sparkContext.setLogLevel("ERROR")

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        materialize(fn(spark, sf_dir))  # cold / warm-up
        warm = []
        for _ in range(3):
            t0 = time.time()
            materialize(fn(spark, sf_dir))
            warm.append(time.time() - t0)
        times[name] = round(min(warm), 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_warm_total",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
