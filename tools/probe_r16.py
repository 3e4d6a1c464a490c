"""Targeted solo probe: time named bench rows (cold + min-of-N warm,
noop sink) in one fresh JVM — the weak-class probe protocol.

Usage: python tools/probe_r16.py <sf_dir> <name> [name ...] [--runs N]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=")[1])
    sf_dir, names = args[0], args[1:]

    from compute_histogram_spark.session import get_session
    from compute_histogram_spark import registry
    from bench import LOCAL_QUERIES, materialize

    spark = get_session("probe_r16")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in names:
        fn = LOCAL_QUERIES.get(name) or registry.QUERIES[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        t0 = time.monotonic()
        materialize(fn(spark, sf_dir))
        cold = time.monotonic() - t0
        ts = []
        for _ in range(runs):
            t0 = time.monotonic()
            materialize(fn(spark, sf_dir))
            ts.append(time.monotonic() - t0)
        out[name] = {"cold": round(cold, 3), "warm_min": round(min(ts), 3),
                     "warm": [round(t, 3) for t in ts]}
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
