"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Reference scope note: wri/compute_histogram has no joins beyond the decile
SQL's cross join (compute_histogram.sql:2); these are north-star extensions
(SURVEY §2.4) for event-stream enrichment at 100 TB.

**As-of join** (:func:`asof_join`) — "for each left row, the most recent
right row at or before its timestamp, per key". The naive formulation is a
range join (``l.key = r.key AND r.ts <= l.ts`` + argmax) whose pair space
explodes with history length. The scalable formulation used here is the
union-and-carry-forward plan:

1. tag both sides and union into one (key, ts, tag, payload...) relation
2. one window per key ordered by (ts, tag, tiebreak):
   ``last(payload, ignoreNulls) ROWS UNBOUNDED PRECEDING..CURRENT ROW``
   carries the latest right payload forward onto every left row
3. keep left rows

Cost: ONE shuffle on the key (the window sort), zero join fan-out, O(1)
running state per row — the standard mapping of KDB/Flink-style as-of onto
a shuffle engine. A skewed key serializes inside its window partition;
:func:`asof_join_salted` is the output-identical time-bucketed variant
(local carry per (key, bucket) + bucket-granular prefix-carry stitch) for
when one key dominates.

**Range join** (:func:`range_band_join`) — enrich a fact with a small set
of [lo, hi) bands. Non-equi predicates can't hash-partition, so Spark plans
this as BroadcastNestedLoopJoin — the right physical plan when the band
table is tiny (bands are human-defined tiers). We broadcast explicitly so
the fact side never shuffles. For a *large* range dim the scale path is
interval bucketing: quantize both sides to a coarse bucket key, equi-join
on the bucket, post-filter the exact predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    TimestampNTZType,
    TimestampType,
)


def ntz_micros(col: str) -> Column:
    """Epoch micros from a TIMESTAMP_NTZ, timezone-independent.

    ``unix_micros`` only takes TIMESTAMP (LTZ), and an NTZ->LTZ cast shifts
    by the session timezone — a silent correctness bug when the driver's
    session isn't UTC. ``timestampdiff`` against an NTZ epoch literal stays
    entirely in wall-clock space, matching DuckDB's ``epoch_us``.
    """
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
    )


def epoch_micros_sql(df: DataFrame, col: str = "ts") -> str:
    """SQL text yielding epoch-micros BIGINT from ``df[col]``, dispatching on
    the column's actual dtype so every time-based operator accepts all three
    layouts an events source may carry:

    - ``TIMESTAMP_NTZ`` (the testdata's current ``timestamp[us]`` parquet):
      wall-clock ``timestampdiff`` from the NTZ epoch literal — matches
      DuckDB's ``epoch_us`` exactly, with no session-timezone shift.
    - ``TIMESTAMP`` (LTZ): ``unix_micros``, the instant's true epoch micros.
    - integral (legacy epoch-*nanos* BIGINT): integer ``div 1000`` — never a
      float divide, since ~1.7e18 nanos exceeds double's 53-bit mantissa.

    Returned as SQL *text* (not a Column) so call sites can compose further
    integer arithmetic (``div``, ``%``) in a single expression — PySpark's
    Column operators have no integer division.
    """
    dt = df.schema[col].dataType
    if isinstance(dt, TimestampNTZType):
        return (
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
        )
    if isinstance(dt, TimestampType):
        return f"unix_micros({col})"
    if isinstance(dt, (LongType, IntegerType)):
        return f"({col} div 1000)"
    raise TypeError(f"column {col!r} has unsupported time dtype {dt}")


def epoch_micros(df: DataFrame, col: str = "ts") -> Column:
    """Column form of :func:`epoch_micros_sql` (same dispatch)."""
    return F.expr(epoch_micros_sql(df, col))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: Column,
    right_ts: Column,
    right_payload: dict[str, Column],
    tiebreak: Column,
) -> DataFrame:
    """Most-recent ``right`` row at-or-before each ``left`` row's time.

    ``left_ts``/``right_ts`` must be the same numeric time unit. The whole
    ``right_payload`` (output name -> right column) travels as ONE struct
    carried by a single ``last(ignoreNulls)`` — atomic per right row, so a
    NULL in one payload field can never mix with another row's fields (the
    struct itself is non-null for every right row even when its fields are
    null). ``tiebreak`` orders simultaneous right rows; the LAST one wins
    (pass the key column for "highest key wins"). Left rows with no prior
    right row keep NULL payload.
    """
    r_proj = right.select(
        F.col(right_key).alias("__k"),
        right_ts.cast("bigint").alias("__ts"),
        F.lit(0).alias("__tag"),
        tiebreak.cast("bigint").alias("__tie"),
        F.struct(*[c.alias(n) for n, c in right_payload.items()]).alias("__p"),
    )
    payload_type = r_proj.schema["__p"].dataType
    left_types = {f.name: f.dataType for f in left.schema.fields}

    l_proj = left.select(
        F.col(left_key).alias("__k"),
        left_ts.cast("bigint").alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast("bigint").alias("__tie"),
        F.lit(None).cast(payload_type).alias("__p"),
        *left.columns,
    )
    r_full = r_proj.select(
        "__k",
        "__ts",
        "__tag",
        "__tie",
        "__p",
        *[F.lit(None).cast(dt).alias(n) for n, dt in left_types.items()],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(
            F.col("__ts").asc(), F.col("__tag").asc(), F.col("__tie").asc_nulls_first()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_proj.unionByName(r_full).select(
        "*", F.last("__p", ignorenulls=True).over(w).alias("__c")
    )
    return carried.where(F.col("__tag") == 1).select(
        *left.columns,
        *[F.col(f"__c.{n}").alias(n) for n in right_payload],
    )


def asof_join_salted(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: Column,
    right_ts: Column,
    right_payload: dict[str, Column],
    tiebreak: Column,
    bucket: int = 86_400_000_000,
) -> DataFrame:
    """Output-identical to :func:`asof_join`, but no window partition ever
    holds one key's whole timeline — the "pre-split by coarse time bucket
    and stitch" plan this module's docstring promises for a dominant key.

    Segmented-scan formulation (carry-forward is associative, so a
    time-ordered split stitches exactly):

    1. **local pass** — the union+carry window runs per
       ``(key, ts div bucket)``: each sort partition is bounded by one
       bucket's rows, so a hot key spreads over its buckets.
    2. **bucket summary** — per (key, bucket), ``max_by`` picks the LAST
       right payload under the same (ts, tiebreak) order the window uses;
       one row per (key, bucket-with-right-rows).
    3. **prefix-carry** — a per-key window over the summary rows (plus the
       left side's distinct buckets as probe markers) carries the latest
       payload strictly-before each bucket. This window is per key but
       over O(buckets) rows, not O(events).
    4. left rows take their local carry, falling back to the bucket's
       incoming payload when no right row preceded them in their bucket.

    ``bucket`` is in the ts unit (default: 1 day of epoch-micros). The
    adversarial shape — a key whose rows all land in ONE bucket — degrades
    to the plain operator for that key; shrink ``bucket`` to spread it.
    """
    r_proj = right.select(
        F.col(right_key).alias("__k"),
        right_ts.cast("bigint").alias("__ts"),
        F.lit(0).alias("__tag"),
        tiebreak.cast("bigint").alias("__tie"),
        F.struct(*[c.alias(n) for n, c in right_payload.items()]).alias("__p"),
    )
    payload_type = r_proj.schema["__p"].dataType
    left_types = {f.name: f.dataType for f in left.schema.fields}
    l_proj = left.select(
        F.col(left_key).alias("__k"),
        left_ts.cast("bigint").alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast("bigint").alias("__tie"),
        F.lit(None).cast(payload_type).alias("__p"),
        *left.columns,
    )
    r_full = r_proj.select(
        "__k", "__ts", "__tag", "__tie", "__p",
        *[F.lit(None).cast(dt).alias(n) for n, dt in left_types.items()],
    )
    unioned = l_proj.unionByName(r_full).withColumn(
        "__b", F.expr(f"__ts div {bucket}")
    )
    w_local = (
        Window.partitionBy("__k", "__b")
        .orderBy(
            F.col("__ts").asc(), F.col("__tag").asc(),
            F.col("__tie").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = unioned.select(
        "*", F.last("__p", ignorenulls=True).over(w_local).alias("__c")
    )

    # last right payload per (key, bucket) under the window's exact order
    summary = r_proj.withColumn("__b", F.expr(f"__ts div {bucket}")).groupBy(
        "__k", "__b"
    ).agg(
        F.max_by("__p", F.struct(F.col("__ts"), F.col("__tie"))).alias("__lp")
    )
    probes = (
        l_proj.select("__k", F.expr(f"__ts div {bucket}").alias("__b"))
        .distinct()
        .withColumn("__lp", F.lit(None).cast(payload_type))
        .withColumn("__src", F.lit(0))
    )
    w_carry = (
        Window.partitionBy("__k")
        # probe markers sort BEFORE right summaries within a bucket, so the
        # PRECEDING frame seen from a probe holds only summaries of
        # strictly-earlier buckets — a bucket's own last-right payload must
        # never become its own incoming (in-bucket right rows are the local
        # pass's job, and may postdate the left row)
        .orderBy(F.col("__b").asc(), F.col("__src").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    incoming = (
        summary.withColumn("__src", F.lit(1))
        .unionByName(probes)
        .select(
            "__k", "__b", "__src",
            F.last("__lp", ignorenulls=True).over(w_carry).alias("__in"),
        )
        .where(F.col("__src") == 0)
        .drop("__src")
    )
    return (
        local.where(F.col("__tag") == 1)
        # SHUFFLE_HASH: `incoming` is one row per (key, active bucket) —
        # DATA-scaled — but its multi-aggregate subtree gets a degenerate
        # static size estimate, so the planner would broadcast it and the
        # choice sticks at every scale (the same misplan class
        # tools/plan_audit.py now hard-fails; see dedup ngram-jaccard).
        # A shuffled hash join builds the carry side per partition: no
        # sort, no broadcast of a table that grows with the key space.
        .join(incoming.hint("shuffle_hash"), ["__k", "__b"], "left")
        # coalesce the WHOLE struct, never field-wise: a NULL field inside a
        # carried payload must not be backfilled from an older right row
        # (same atomicity rule as asof_join's single-struct carry)
        .withColumn("__f", F.coalesce(F.col("__c"), F.col("__in")))
        .select(
            *left.columns,
            *[F.col(f"__f.{n}").alias(n) for n in right_payload],
        )
    )


def asof_enrich_events(events: DataFrame, orders: DataFrame) -> DataFrame:
    """Each event joined to the user's most recent order at-or-before the
    event time (events.ts may be TIMESTAMP_NTZ or epoch-nanos BIGINT —
    :func:`epoch_micros` dispatches; orders.o_orderdate is TIMESTAMP_NTZ;
    both compared at epoch micros). Ties on order time break to the highest
    o_orderkey, matching the oracle.
    """
    ev = events.select(
        "event_id", "user_id", epoch_micros(events).alias("tsu")
    )
    out = asof_join(
        ev,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts=F.col("tsu"),
        right_ts=ntz_micros("o_orderdate"),
        right_payload={
            "asof_orderkey": F.col("o_orderkey"),
            "asof_order_us": ntz_micros("o_orderdate"),
            "asof_totalprice": F.col("o_totalprice"),
        },
        tiebreak=F.col("o_orderkey"),
    )
    return out.select(
        "event_id", "user_id", "asof_orderkey", "asof_order_us", "asof_totalprice"
    ).orderBy("event_id")


def asof_enrich_events_salted(
    events: DataFrame, orders: DataFrame, bucket: int = 86_400_000_000
) -> DataFrame:
    """Hot-key-safe twin of :func:`asof_enrich_events` — same arguments,
    same output columns, but through :func:`asof_join_salted` (per-day
    time-bucket salt), so no window partition ever holds one user's whole
    timeline. Output-identical by the stitching argument proven in
    tests/test_temporal.py; registered beside the plain version so BOTH
    physical strategies carry oracle evidence."""
    ev = events.select(
        "event_id", "user_id", epoch_micros(events).alias("tsu")
    )
    out = asof_join_salted(
        ev,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts=F.col("tsu"),
        right_ts=ntz_micros("o_orderdate"),
        right_payload={
            "asof_orderkey": F.col("o_orderkey"),
            "asof_order_us": ntz_micros("o_orderdate"),
            "asof_totalprice": F.col("o_totalprice"),
        },
        tiebreak=F.col("o_orderkey"),
        bucket=bucket,
    )
    return out.select(
        "event_id", "user_id", "asof_orderkey", "asof_order_us", "asof_totalprice"
    ).orderBy("event_id")


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    ts: Column,
    state_cols: list[str],
    tiebreak: Column,
) -> DataFrame:
    """Collapse a change stream into SCD2 (type-2 slowly-changing-dimension)
    validity intervals: one row per (key, state-run) with
    ``[valid_from, valid_to)`` in the units of ``ts`` and ``valid_to`` NULL
    for the current (open) interval.

    Reference scope note: the reference has no temporal modeling at all;
    this is the north-star "hypertable rollup"-family extension — turning an
    append-only event log into a point-in-time dimension, the input shape
    every feature-store / training-snapshot join needs.

    Plan shape (the gaps-and-islands idiom, one shuffle):

    1. window per key ordered by (ts, tiebreak): a row opens a new run when
       any state column ``IS DISTINCT FROM`` its ``lag()`` (null-safe, so
       the first row per key always opens).
    2. keep only run-opening rows (``valid_from = ts``).
    3. ``lead(valid_from)`` over the same key order gives ``valid_to``.

    Both windows and the filter keep the same hash partitioning on ``key``,
    so Catalyst plans ONE Exchange; cost at 100 TB is one shuffle of the
    change stream, state per row is O(1). Simultaneous changes (equal ts)
    are ordered by ``tiebreak``; the later row wins the interval start and
    the earlier one becomes a zero-width ``[t, t)`` interval, preserving
    every state transition rather than silently dropping one.
    """
    state = [F.col(c) for c in state_cols]
    proj = df.select(
        F.col(key_col), ts.cast("bigint").alias("__ts"),
        tiebreak.cast("bigint").alias("__tie"), *state,
    )
    w = Window.partitionBy(key_col).orderBy("__ts", "__tie")
    opens = F.lit(False)
    for c in state_cols:
        # null-safe inequality vs previous row: NOT (a <=> b)
        opens = opens | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    # lag() of the first row is NULL for every state col, so eqNullSafe is
    # False (unless the state itself is NULL) — force the first row open.
    first = F.lag("__ts").over(w).isNull()
    runs = proj.withColumn("__open", opens | first).where(F.col("__open"))
    w2 = Window.partitionBy(key_col).orderBy("__ts", "__tie")
    return runs.select(
        F.col(key_col),
        *state_cols,
        F.col("__ts").alias("valid_from"),
        F.lead("__ts").over(w2).alias("valid_to"),
    )


def user_state_history(events: DataFrame) -> DataFrame:
    """SCD2 history of each user's event_type "state" (epoch-micros bounds):
    consecutive same-type events collapse into one interval; ties on ts
    break by event_id. The concrete twin for :func:`scd2_intervals`."""
    ev = events.select(
        "user_id", "event_type", "event_id", epoch_micros(events).alias("tsu")
    )
    out = scd2_intervals(
        ev,
        key_col="user_id",
        ts=F.col("tsu"),
        state_cols=["event_type"],
        tiebreak=F.col("event_id"),
    )
    return out.orderBy("user_id", "valid_from")


def range_band_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Tag each fact row with the band where ``lo <= value < hi``.

    ``bands`` is broadcast (BroadcastNestedLoopJoin — no fact shuffle).
    Overlapping bands duplicate rows, by join semantics; keep bands disjoint.
    """
    v = F.col(value_col)
    return fact.join(
        F.broadcast(bands), (v >= F.col(lo_col)) & (v < F.col(hi_col)), "inner"
    )


VALUE_BANDS = [
    ("low", 0.0, 50.0),
    ("mid", 50.0, 150.0),
    ("high", 150.0, 300.0),
    ("extreme", 300.0, 1_000_000.0),
]


def events_by_band(events: DataFrame) -> DataFrame:
    """Event counts + value sums per human-defined value tier (range join +
    group agg; money summed in integer cents for cross-engine exactness)."""
    spark = events.sparkSession
    bands = spark.createDataFrame(VALUE_BANDS, "band STRING, lo DOUBLE, hi DOUBLE")
    tagged = range_band_join(
        events.where(F.col("value").isNotNull() & ~F.isnan("value")), bands, "value"
    )
    return (
        tagged.groupBy("band", "lo")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0).alias(
                "sum_value"
            ),
        )
        .orderBy("lo")
        .select("band", "n_events", "sum_value")
    )
