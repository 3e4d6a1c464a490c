"""Reproduce the JVM session-aging effect on map-kernel throughput (r9).

Running ~23 DISTINCT query plans in one local JVM degrades a subsequent
map-heavy kernel (text_profile) by ~1.5-1.7x and it never recovers in
that session. Controls that ISOLATE the cause to distinct-plan count:

    python tools/aging_experiment.py distinct        # degrades ~1.7x
    python tools/aging_experiment.py repeat          # 46 repeats of ONE
                                                     # query: NO degradation
                                                     # (gets faster - warm JIT)
    python tools/aging_experiment.py distinct_noui   # UI off: still degrades
    python tools/aging_experiment.py distinct_bigcache  # codegen cache
                                                     # 5000 entries: still
                                                     # degrades

Ruled out by measurement (see BASELINE.md r9): code-cache exhaustion
(64/116 MB), metaspace, heap/GC pressure, listener/UI state, codegen
class-cache eviction. Remaining mechanism consistent with JIT
type-profile pollution: every distinct plan adds generated classes
(BufferedRowIterator / UnsafeProjection subclasses) flowing through the
same shared runtime call sites, which become megamorphic; inline caches
in hot paths (UTF8String ops, iterator loops) degrade process-wide.

Production relevance: long-lived executors see many distinct plans, so
the AGED number is the honest steady-state one; fresh-JVM A/Bs
overestimate by ~1.5x. The bench protocol's fixed HEADLINE order keeps
cross-round comparisons valid (every query ages identically).
"""
import sys
import time

import os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import bench
from compute_histogram_spark import registry
from compute_histogram_spark.operators import text as TX
from compute_histogram_spark.session import get_session
from compute_histogram_spark.sources.tables import load


def mat(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "distinct"
    d = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    extra = None
    if mode.endswith("noui"):
        extra = {"spark.ui.enabled": "false"}
    elif mode.endswith("bigcache"):
        extra = {"spark.sql.codegen.cache.maxEntries": "5000"}
    spark = get_session("aging", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, d, "documents")

    def t4(tag):
        ts = []
        for _ in range(4):
            t0 = time.time()
            mat(TX.text_profile(docs))
            ts.append(time.time() - t0)
        print(f"{mode} {tag}: min={min(ts):.3f} all={[round(x, 3) for x in ts]}",
              flush=True)

    mat(TX.text_profile(docs))  # cold
    t4("fresh")
    if mode.startswith("repeat"):
        fn = registry.QUERIES["histogram_linear"]
        for _ in range(46):
            mat(fn(spark, d))
    else:
        for name in bench.HEADLINE[:23]:
            fn = registry.QUERIES.get(name) or bench.LOCAL_QUERIES[name]
            mat(fn(spark, d))
            mat(fn(spark, d))
    t4("aged")


if __name__ == "__main__":
    main()
