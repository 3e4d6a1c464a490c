"""User-behavior analytics over the events table: ordered conversion
funnels and weekly cohort retention.

Both reuse the engine's transform -> bucket -> count shape (SURVEY §2.2
A5-A9) with the user as the bucketing key:

- **funnel**: one groupBy(user) computing per-stage first-touch times as
  conditional MINs (map-side partial aggregation — the shuffle carries one
  row per user, not per event), then a single scalar aggregation counts
  users whose stage times are strictly increasing. Two shuffles total, the
  second over ONE row.
- **cohort retention**: activity is reduced to distinct (user, week) pairs
  first (the cheapest possible projection of 100 TB of events), the
  cohort week is a per-user MIN, and the join back is user-keyed — both
  sides of that join are outputs of shuffles on user_id, so they arrive
  co-partitioned; no extra Exchange.

Cross-engine determinism: event times compare as INTEGER epoch-micros
(``epoch_micros_sql`` dispatches TIMESTAMP_NTZ vs legacy nanos-BIGINT ts —
DuckDB's TIMESTAMP is micros, so both engines compare identically even for
same-microsecond events), and cohort buckets are epoch-week integers
(``us div day_us div 7``) — no calendar, no session-timezone dependence
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from compute_histogram_spark.operators.temporal import epoch_micros_sql
from compute_histogram_spark.operators.windows import ts_micros

DEFAULT_STAGES = ("view", "click", "purchase")


US_PER_DAY = 86_400_000_000


def _week_key(events: DataFrame) -> F.Column:
    """Monotone epoch-week index — pure integer arithmetic (no calendar, no
    timezone): identical in every engine and session configuration."""
    tsu = epoch_micros_sql(events)
    return F.expr(f"({tsu}) div {US_PER_DAY} div 7").alias("wk")


def conversion_funnel(
    events: DataFrame, stages: tuple[str, ...] = DEFAULT_STAGES
) -> DataFrame:
    """Ordered funnel: users reach stage i if their FIRST stage-i event is
    strictly after their first stage-(i-1) event, cumulatively.

    -> (stage_idx INT, stage STRING, n_users BIGINT, conversion DOUBLE)
    with conversion relative to stage 0.
    """
    firsts = [
        F.min(F.when(F.col("event_type") == s, ts_micros(events))).alias(f"t{i}")
        for i, s in enumerate(stages)
    ]
    per_user = events.groupBy("user_id").agg(*firsts)

    reached = F.col("t0").isNotNull()
    counts = []
    for i in range(len(stages)):
        if i > 0:
            reached = reached & (F.col(f"t{i}") > F.col(f"t{i - 1}"))
        counts.append(F.count(F.when(reached, F.lit(1))).alias(f"n{i}"))
    row = per_user.agg(*counts)

    cells = ", ".join(
        f"{i}, '{s}', n{i}, cast(n{i} as double) / n0" for i, s in enumerate(stages)
    )
    return (
        row.select(
            F.expr(
                f"stack({len(stages)}, {cells}) AS "
                "(stage_idx, stage, n_users, conversion)"
            )
        )
        .withColumn("stage_idx", F.col("stage_idx").cast("int"))
        .orderBy("stage_idx")
    )


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: users grouped by first-active epoch-week;
    for each cohort and week-offset, how many were active.

    -> (cohort_week_start_s BIGINT, week_offset INT, n_users BIGINT);
    ``cohort_week_start_s`` is epoch seconds of the cohort week's start.
    Rows with NULL ts are ignored (no week): collect_set drops NULLs,
    where the pre-r13 distinct-based plan would have carried a NULL week
    through — retention of an event with no time is undefined anyway.
    """
    # ONE fact shuffle (r13; was distinct -> groupBy-min -> join, three):
    # per-user week sets aggregate with map-side partial dedup, the
    # cohort week is element 1 of the sorted set, and the explode feeds
    # the bounded (cohort, week) count directly. Per-user state is
    # capped at the number of distinct epoch-weeks in the data (~52/yr),
    # not event volume. A/B value-equal vs the old plan: sf1 0.59->0.53,
    # sf10 1.06->0.94, sf100 4.93->4.83 s (the sf100 residual is the
    # scan constant — see the user_id-bucketed layout variant in bench,
    # which removes this shuffle too). Each user contributes exactly one
    # row per (cwk, wk), so a plain count IS the distinct-user count.
    # r15: layouts written with the derived wk column (bench's user_id
    # events layout) aggregate the STORED epoch-week — same integer
    # `ts div day div 7` the expression derives, value-exact by
    # construction; the per-run timestamp decode + div chain was the
    # remaining non-scan cost of the sf100 layout row (VERDICT r14 #6)
    wk_src = (
        events.select("user_id", "wk")
        if "wk" in events.columns
        else events.select("user_id", _week_key(events))
    )
    per_user = (
        wk_src
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_set("wk")).alias("wks"))
    )
    ex = per_user.select(
        F.element_at("wks", 1).alias("cwk"), F.explode("wks").alias("wk")
    )
    return (
        ex.groupBy("cwk", "wk")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            (F.col("cwk") * 7 * 86_400).alias("cohort_week_start_s"),
            (F.col("wk") - F.col("cwk")).cast("int").alias("week_offset"),
            "n_users",
        )
        .orderBy("cohort_week_start_s", "week_offset")
    )


def cohort_retention_clustered(events: DataFrame) -> DataFrame:
    """:func:`cohort_retention` for input ALREADY clustered on user_id
    (the bench user_id events layout): the pre-r13 distinct -> min ->
    join chain, which on raw parquet costs three fact shuffles (the
    r13 rejection), runs ENTIRELY exchange-free here — distinct
    (user, wk), the per-user min, and the join back all cluster on a
    superset of the bucket key, so only the bounded (cohort, week)
    aggregate exchanges. It also swaps the collect_set OBJECT
    aggregate for codegen'd hash aggregates: sf100 warm 1.85 -> 1.45 s
    (value-equal; the layout row's measured floor — the scan alone is
    0.65 s). Do NOT use on unclustered input."""
    per = (
        events.select("user_id", "wk")
        if "wk" in events.columns
        else events.select("user_id", _week_key(events))
    ).where(F.col("wk").isNotNull()).distinct()
    coh = per.groupBy("user_id").agg(F.min("wk").alias("cwk"))
    j = per.join(coh, "user_id")
    return (
        j.groupBy("cwk", "wk")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            (F.col("cwk") * 7 * 86_400).alias("cohort_week_start_s"),
            (F.col("wk") - F.col("cwk")).cast("int").alias("week_offset"),
            "n_users",
        )
        .orderBy("cohort_week_start_s", "week_offset")
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """Event-type transition matrix: for each user's time-ordered stream,
    count (event_type -> next event_type) steps — the Markov-chain view of
    user behavior.

    ``lead`` over (user, time) is a per-user window: Spark sorts within
    each user partition only (no global sort), and the downstream count is
    an ordinary partial->final aggregation on a tiny key space
    (|types|^2). Ties in ts are broken by event_id so the successor is
    deterministic in every engine.

    -> (from_type, to_type, n_transitions)
    """
    w = Window.partitionBy("user_id").orderBy(
        ts_micros(events).asc(), F.col("event_id").asc()
    )
    t = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    return (
        t.where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("from_type", "to_type")
    )


def session_concurrency(
    sessions: DataFrame, bucket_s: int = 3600
) -> DataFrame:
    """Sweep-line interval aggregation: how many sessions are active at
    every change point — the load-curve query behind capacity planning and
    concurrency SLAs.

    Classic sweep-line needs ONE globally ordered running sum, which is
    the exact plan shape this engine bans (a single-partition window).
    Scale-safe construction instead (the two-phase prefix-sum pattern of
    ``pipeline.pack_shards`` / the salted sessionize stitch):

    1. each session [start_us, end_us] (inclusive) becomes two delta rows
       (+1 at start, -1 at end+1), summed per DISTINCT timestamp — ties
       collapse in the aggregate, so no within-timestamp ordering
       ambiguity exists at all;
    2. running sums are computed per time BUCKET (window partitioned by
       ``ts div bucket``, never global);
    3. bucket totals get their own running sum — a window over the
       bucket-level aggregate, bounded by the number of buckets, i.e. the
       time span, not the data volume;
    4. a broadcast join adds each bucket's exclusive prefix back.

    -> (ts_us, n_active), one row per change point: n_active is the count
    of concurrently active sessions at and after ts_us until the next
    change point. Sum of all deltas is 0, so the curve ends at 0.
    """
    bucket_us = bucket_s * 1_000_000
    deltas = (
        sessions.select(F.col("start_us").alias("ts_us"), F.lit(1).alias("d"))
        .unionAll(
            sessions.select(
                (F.col("end_us") + 1).alias("ts_us"), F.lit(-1).alias("d")
            )
        )
        .groupBy("ts_us")
        .agg(F.sum("d").alias("d"))
        # floor, not truncate-toward-zero: pre-1970 (negative) timestamps
        # must bucket floor-consistently with the DuckDB oracle's `//`
        .withColumn("bkt", F.floor(F.col("ts_us") / F.lit(bucket_us)))
    )
    in_bucket = Window.partitionBy("bkt").orderBy("ts_us")
    local = deltas.withColumn(
        "run",
        F.sum("d").over(
            in_bucket.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    bucket_totals = deltas.groupBy("bkt").agg(F.sum("d").alias("tot"))
    # running sum over the BUCKET aggregate: bounded by the time span
    over_buckets = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = bucket_totals.withColumn(
        "prefix", F.coalesce(F.sum("tot").over(over_buckets), F.lit(0))
    ).select("bkt", "prefix")
    return (
        local.join(F.broadcast(offsets), "bkt")
        .select(
            "ts_us",
            (F.col("prefix") + F.col("run")).cast("bigint").alias("n_active"),
        )
        .orderBy("ts_us")
    )


def peak_concurrency(
    sessions: DataFrame, bucket_s: int = 3600
) -> DataFrame:
    """Per-bucket peak of the concurrency curve -> (bucket_start_s,
    peak_active). A change point's n_active holds until the next change
    point, so a bucket's peak must also consider the level CARRIED INTO it
    (the previous emitted bucket's exit level — carried across any gap; a
    bucket with late change points may peak at entry). Only buckets that
    CONTAIN a change point emit a row: a gap bucket's level is constant
    (= the previous row's exit level), so the emitted rows fully determine
    the step curve — same contract as the DuckDB sweep oracle
    (tests/test_behavior.py). The carried level rides the bucket-prefix
    sum — already bounded, reused here."""
    curve = session_concurrency(sessions, bucket_s=bucket_s)
    bucket_us = bucket_s * 1_000_000
    b = curve.withColumn("bkt", F.floor(F.col("ts_us") / F.lit(bucket_us)))
    per_bucket = b.groupBy("bkt").agg(
        F.max("n_active").alias("peak_inside"),
        F.max_by("n_active", "ts_us").alias("exit_level"),
    )
    over_buckets = Window.orderBy("bkt")
    return (
        per_bucket.withColumn(
            "entry_level",
            F.coalesce(F.lag("exit_level").over(over_buckets), F.lit(0)),
        )
        .select(
            (F.col("bkt") * bucket_s).alias("bucket_start_s"),
            F.greatest("peak_inside", "entry_level")
            .cast("bigint")
            .alias("peak_active"),
        )
        .orderBy("bucket_start_s")
    )
