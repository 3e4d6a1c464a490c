"""Third-decade scale probe: the headline trend queries at sf100.

The per-round bench sweeps sf0.1 -> sf1 -> sf10 (BENCH_r{N}); this
one-off tool extends the two-engine ratio trend a THIRD decade (sf100 =
1000x the driver testdata: 600M lineitem, 5M documents, ~17 GB parquet)
over a hand-picked probe set — the three Arrow/text kernels and the two
window-heavy operators Spark already wins at sf10, plus Q5 for the
DuckDB-dominant side of the trend. Results land in BASELINE.md's r11
section; this is evidence tooling, not part of the per-round bench
(budget: a full sf100 sweep of all 26 queries would run ~1 h).

DuckDB runs in a SUBPROCESS with a hard timeout: at this scale the
comparator can thrash or die (the sf10 neardup DNF burned 25+ min and
53 GB before it was killed in r10) and a probe must record DNFs
honestly without losing the rest of the run.

Usage: python tools/scale_probe.py [scale_dir] [timeout_s_per_duck_query]
       [query ...]   (query names override the default PROBE set)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE = [
    "doc_fingerprint",
    "text_stats",
    "dedup_minhash",
    "sessionize",
    "asof_join",
    "local_supplier_revenue",
]


def _duck_once(sql: str, scale_dir: str, timeout_s: float) -> float | None:
    """One DuckDB execution in a subprocess; None on timeout/death."""
    prog = (
        "import duckdb, os, sys, time\n"
        "con = duckdb.connect()\n"
        f"d = {scale_dir!r}\n"
        "for t in ('region nation customer supplier part orders lineitem "
        "events documents embeddings').split():\n"
        "    p = os.path.join(d, t + '.parquet')\n"
        "    if os.path.exists(p):\n"
        "        con.execute(f\"CREATE VIEW {t} AS SELECT * FROM '{p}'\")\n"
        "t0 = time.time()\n"
        f"con.execute({sql!r}).fetchall()\n"
        "print(time.time() - t0)\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", prog],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return None
    if r.returncode != 0:
        return None
    return float(r.stdout.strip().splitlines()[-1])


def main() -> None:
    # --cold: ONE timed execution per query instead of cold + min-of-2
    # warm. At sf100 the 8 GB single-JVM harness completes the fact-fact
    # join / distinct-agg queries COLD but OOMs their warm re-executions
    # in the same JVM (the r9 aging effect at its extreme — BASELINE.md
    # r12 continuation); cold-in-a-fresh-JVM is the honest number there.
    argv = [a for a in sys.argv[1:] if a != "--cold"]
    cold_only = "--cold" in sys.argv[1:]
    scale_dir = argv[0] if len(argv) > 0 else "/tmp/sf100"
    duck_timeout = float(argv[1]) if len(argv) > 1 else 600.0
    probe = argv[2:] or PROBE

    from compute_histogram_spark.session import autoscale_shuffle, get_session
    from compute_histogram_spark import registry
    from bench import LOCAL_ORACLES, LOCAL_QUERIES

    spark = get_session("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # the sf100 OOM lesson made automatic (VERDICT r11 #4): shuffle
    # partitions scale with the probe dir's input volume (17 GB -> ~136)
    # instead of requiring the SPARK_GRAFT_SHUFFLE env knob
    print("shuffle_partitions:", autoscale_shuffle(spark, scale_dir))

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    # staged twins (not yet in the 50-entry driver window) resolve
    # through the TPC-H sweep map: probe names like
    # "q16_supplier_part_counts" work the same as window names
    from tpch_sweep_bench import SWEEP

    staged = {n: (getattr(registry, qfn), getattr(registry, osql))
              for n, qfn, osql in SWEEP}
    # bench's tracked TPC-H labels (tpch_qNN) resolve the same way
    from bench import _TPCH_STAGED

    staged.update({
        n: (getattr(registry, qfn), getattr(registry, osql))
        for n, (qfn, osql) in _TPCH_STAGED.items()
    })

    out: dict = {"scale_dir": scale_dir, "queries": {}}
    for name in probe:
        if name in staged:
            fn, sql = staged[name]
        else:
            fn = LOCAL_QUERIES.get(name) or registry.QUERIES[name]
            sql = registry.ORACLES.get(name) or LOCAL_ORACLES.get(name)
        row: dict = {}
        try:
            if cold_only:
                t0 = time.time()
                materialize(fn(spark, scale_dir))
                row["spark_cold"] = round(time.time() - t0, 2)
                row["spark"] = row["spark_cold"]
            else:
                materialize(fn(spark, scale_dir))  # cold
                ts = []
                for _ in range(2):
                    t0 = time.time()
                    materialize(fn(spark, scale_dir))
                    ts.append(time.time() - t0)
                row["spark"] = round(min(ts), 2)
        except Exception as e:  # noqa: BLE001
            row["spark_error"] = f"{type(e).__name__}: {e}"[:200]
        if sql is not None and "spark" in row:
            cold = _duck_once(sql, scale_dir, duck_timeout)
            if cold is None:
                row["duckdb"] = None
                row["duckdb_dnf_timeout_s"] = duck_timeout
            else:
                warm = _duck_once(sql, scale_dir, duck_timeout)
                row["duckdb"] = round(min(x for x in (cold, warm) if x), 2)
        out["queries"][name] = row
        print(f"{name}: {row}", flush=True)
        # incremental persistence: a killed run (driver timeout, OOM'd
        # comparator) keeps every completed row
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "scale_probe_result.json"), "w") as f:
            json.dump(out, f, indent=1)
    both = [
        (r["spark"], r["duckdb"])
        for r in out["queries"].values()
        if r.get("spark") is not None and r.get("duckdb") is not None
    ]
    if both:
        s = round(sum(x for x, _ in both), 2)
        d = round(sum(y for _, y in both), 2)
        out["spark_total_s"] = s
        out["duckdb_total_s"] = d
        out["ratio"] = round(s / d, 3) if d else None
        out["n_both"] = len(both)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
