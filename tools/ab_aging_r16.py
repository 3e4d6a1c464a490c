"""A/B the JVM-aging gap on the headline set (r16 optimization round).

The driver's headline metric is the MIXED (order-randomized, aged-JVM)
total; the committed bench shows mixed 20.56 s vs fresh 13.96 s on this
box — a ~6.6 s aging tax across 26 queries that no plan change explains.
Hypotheses, per guide §1.2 step 3 (config AFTER algorithm; the plans are
unchanged by construction here):

- code-cache pressure: each query compiles several whole-stage-codegen
  classes; JIT'd code for ~90+ generated classes x 6 runs can exhaust
  the JVM's default 240 MB ReservedCodeCacheSize, after which the
  sweeper deoptimizes hot methods (classic "fast fresh, slow aged").
- GC: G1 default on an 8g heap; old-gen churn from cached relations +
  broadcast cleanup.

Usage: python tools/ab_aging_r16.py <variant> [sf_dir]
Variants: base | codecache | parallelgc | combo
One variant per process (fresh JVM). Protocol = bench.py's _bench_set
(cold + min-of-5 warm back-to-back = fresh; then 2 seeded randomized
passes = mixed), headline set only, no comparator sweeps.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "base": {},
    "codecache": {
        "spark.driver.extraJavaOptions":
            "-XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing",
    },
    "parallelgc": {
        "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
    },
    "combo": {
        "spark.driver.extraJavaOptions":
            "-XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing "
            "-XX:+UseParallelGC",
    },
}


def main():
    variant = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from compute_histogram_spark.session import get_session
    from compute_histogram_spark import registry
    from bench import HEADLINE, LOCAL_QUERIES, _bench_set

    spark = get_session("ab_aging", extra_conf=VARIANTS[variant])
    spark.sparkContext.setLogLevel("ERROR")
    times, mixed, errors = {}, {}, {}
    t0 = time.time()
    _bench_set(
        spark, sf_dir,
        {n: LOCAL_QUERIES.get(n) or registry.QUERIES[n] for n in HEADLINE},
        times, errors, mixed=mixed,
    )
    out = {
        "variant": variant,
        "fresh_total": round(sum(times.values()), 3),
        "mixed_total": round(sum(mixed.values()), 3),
        "wall_s": round(time.time() - t0, 1),
        "n_err": len(errors),
        "fresh": times,
        "mixed": mixed,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    with open(f"/tmp/ab_aging_{variant}.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
