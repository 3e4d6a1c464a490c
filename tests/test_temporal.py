"""asof_join / range_band_join semantics on hand-built frames with known
answers, including the edge cases the oracle data can't isolate: exact-tie
timestamps, no-prior-row lefts, and tiebreak order."""

from pyspark.sql import Row, functions as F

from compute_histogram_spark.operators import temporal as T


def test_asof_basic_and_no_prior(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, t=100, lid=1),
            Row(k=1, t=50, lid=2),   # before every right row -> NULL payload
            Row(k=2, t=100, lid=3),  # key with no right rows at all
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, rt=60, rid=10, price=1.5),
            Row(k=1, rt=90, rid=11, price=2.5),
            Row(k=1, rt=101, rid=12, price=9.9),  # after t=100: excluded
        ]
    )
    out = {
        r["lid"]: (r["rid"], r["price"])
        for r in T.asof_join(
            left,
            right,
            left_key="k",
            right_key="k",
            left_ts=F.col("t"),
            right_ts=F.col("rt"),
            right_payload={"rid": F.col("rid"), "price": F.col("price")},
            tiebreak=F.col("rid"),
        ).collect()
    }
    assert out[1] == (11, 2.5)       # latest at-or-before 100 is rt=90
    assert out[2] == (None, None)    # nothing at-or-before 50
    assert out[3] == (None, None)    # key never seen on the right


def test_asof_tie_at_equal_ts_takes_right_and_highest_tiebreak(spark):
    left = spark.createDataFrame([Row(k=1, t=100, lid=1)])
    right = spark.createDataFrame(
        [Row(k=1, rt=100, rid=7), Row(k=1, rt=100, rid=9), Row(k=1, rt=40, rid=1)]
    )
    out = T.asof_join(
        left,
        right,
        left_key="k",
        right_key="k",
        left_ts=F.col("t"),
        right_ts=F.col("rt"),
        right_payload={"rid": F.col("rid")},
        tiebreak=F.col("rid"),
    ).collect()
    # rt == t qualifies (at-or-before), and among the two rt=100 rows the
    # highest tiebreak (rid=9) wins.
    assert out[0]["rid"] == 9


def test_asof_join_single_shuffle_plan(spark):
    left = spark.createDataFrame([Row(k=1, t=1, lid=1)])
    right = spark.createDataFrame([Row(k=1, rt=1, rid=1)])
    plan = (
        T.asof_join(
            left,
            right,
            left_key="k",
            right_key="k",
            left_ts=F.col("t"),
            right_ts=F.col("rt"),
            right_payload={"rid": F.col("rid")},
            tiebreak=F.col("rid"),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # union + window: exactly one Exchange (the window shuffle), no join node
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_range_band_join_boundaries(spark):
    fact = spark.createDataFrame(
        [Row(v=0.0), Row(v=49.99), Row(v=50.0), Row(v=299.99), Row(v=300.0)]
    )
    bands = spark.createDataFrame(T.VALUE_BANDS, "band STRING, lo DOUBLE, hi DOUBLE")
    out = [
        r["band"]
        for r in T.range_band_join(fact, bands, "v").orderBy("v").collect()
    ]
    # [lo, hi): 50.0 belongs to mid, 300.0 to extreme
    assert out == ["low", "low", "mid", "high", "extreme"]


def test_events_by_band_covers_all_events(spark, sf_dir):
    from compute_histogram_spark.sources.tables import load

    ev = load(spark, sf_dir, "events")
    n_valid = ev.where(
        F.col("value").isNotNull() & ~F.isnan("value") & (F.col("value") >= 0)
    ).count()
    out = T.events_by_band(ev)
    assert out.agg(F.sum("n_events")).first()[0] == n_valid


def test_asof_payload_is_atomic_per_right_row(spark):
    # a NULL field in the newest right row must NOT inherit the value from
    # an older right row — the payload travels as one struct
    left = spark.createDataFrame([Row(k=1, t=10, lid=1)])
    right = spark.createDataFrame(
        [Row(k=1, rt=1, rid=1, price=10.0), Row(k=1, rt=2, rid=2, price=None)],
        "k bigint, rt bigint, rid bigint, price double",
    )
    out = T.asof_join(
        left,
        right,
        left_key="k",
        right_key="k",
        left_ts=F.col("t"),
        right_ts=F.col("rt"),
        right_payload={"rid": F.col("rid"), "price": F.col("price")},
        tiebreak=F.col("rid"),
    ).collect()[0]
    assert out["rid"] == 2
    assert out["price"] is None  # not 10.0 leaked from rid=1


def test_scd2_intervals_golden(spark):
    """Gaps-and-islands on a hand-built change stream: runs collapse,
    state flips reopen, first interval starts at first ts, last is open."""
    rows = [
        # user 1: a a b a  -> [10,30) a, [30,40) b, [40,None) a
        Row(k=1, t=10, i=1, s="a"),
        Row(k=1, t=20, i=2, s="a"),
        Row(k=1, t=30, i=3, s="b"),
        Row(k=1, t=40, i=4, s="a"),
        # user 2: single row -> one open interval
        Row(k=2, t=99, i=5, s="x"),
        # user 3: simultaneous flip at t=50 (tiebreak i): zero-width first
        Row(k=3, t=50, i=6, s="p"),
        Row(k=3, t=50, i=7, s="q"),
    ]
    out = T.scd2_intervals(
        spark.createDataFrame(rows),
        key_col="k",
        ts=F.col("t"),
        state_cols=["s"],
        tiebreak=F.col("i"),
    ).orderBy("k", "valid_from", "s").collect()
    got = [(r["k"], r["s"], r["valid_from"], r["valid_to"]) for r in out]
    assert got == [
        (1, "a", 10, 30),
        (1, "b", 30, 40),
        (1, "a", 40, None),
        (2, "x", 99, None),
        (3, "p", 50, 50),   # zero-width: both transitions preserved
        (3, "q", 50, None),
    ]


SCD2_ORACLE = """
WITH e AS (
    SELECT user_id, event_type, event_id, epoch_us(ts) AS tsu FROM events
),
flagged AS (
    SELECT user_id, event_type, tsu, event_id,
           CASE WHEN lag(event_type) OVER w IS NULL
                     AND lag(tsu) OVER w IS NULL THEN 1
                WHEN event_type IS DISTINCT FROM lag(event_type) OVER w THEN 1
                ELSE 0 END AS chg
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
),
runs AS (SELECT * FROM flagged WHERE chg = 1)
SELECT user_id, event_type, tsu AS valid_from,
       lead(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS valid_to
FROM runs
ORDER BY user_id, valid_from
"""


def test_scd2_vs_duckdb_oracle(spark, sf_dir):
    """Value-exact DuckDB twin over the real events table (outside the
    50-entry registry window, so the oracle evidence lives here)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from check_oracle import compare, duck_connection

    from compute_histogram_spark.sources.tables import load

    sdf = T.user_state_history(load(spark, sf_dir, "events")).toPandas()
    con = duck_connection(sf_dir)
    odf = con.sql(SCD2_ORACLE).df()
    assert len(sdf) > 0
    assert compare("user_state_history", sdf, odf) == []


# ---------------------------------------------------------------------------
# salted as-of: output-identical to asof_join with bounded window partitions
# ---------------------------------------------------------------------------


def _asof_args():
    return dict(
        left_key="k", right_key="k",
        left_ts=F.col("t"), right_ts=F.col("rt"),
        right_payload={"rid": F.col("rid"), "price": F.col("price")},
        tiebreak=F.col("rid"),
    )


def test_asof_salted_golden_edges(spark):
    """The shapes that break a naive split: (a) left row early in a bucket
    whose only in-bucket right row comes AFTER it (incoming must come from
    the PREVIOUS bucket, never the same bucket's last right row); (b) a
    right payload with a NULL field that must not be backfilled from an
    older right row (atomic struct); (c) empty intermediate buckets."""
    left = spark.createDataFrame(
        [
            Row(k=1, t=205, lid=1),   # bucket 2; in-bucket right at 210 is LATER
            Row(k=1, t=215, lid=2),   # takes the 210 right row
            Row(k=1, t=405, lid=3),   # bucket 4 empty of rights -> carry from 210
            Row(k=1, t=95, lid=4),    # bucket 0, before any right -> NULL
            Row(k=2, t=500, lid=5),   # key with no rights at all -> NULL
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, rt=150, rid=10, price=7.0),    # bucket 1
            Row(k=1, rt=210, rid=11, price=None),   # bucket 2, NULL field
        ],
        "k BIGINT, rt BIGINT, rid BIGINT, price DOUBLE",
    )
    plain = T.asof_join(left, right, **_asof_args())
    salted = T.asof_join_salted(left, right, **_asof_args(), bucket=100)
    key = lambda r: r["lid"]
    assert sorted(map(tuple, plain.collect()), key=lambda t: t[2]) == sorted(
        map(tuple, salted.collect()), key=lambda t: t[2]
    )
    got = {r["lid"]: (r["rid"], r["price"]) for r in salted.collect()}
    assert got[1] == (10, 7.0)      # previous bucket, not same-bucket-later
    assert got[2] == (11, None)     # NULL field stays NULL (atomic struct)
    assert got[3] == (11, None)     # carried across an empty bucket
    assert got[4] == (None, None)
    assert got[5] == (None, None)


def test_asof_salted_equals_plain_on_real_tables(spark, sf_dir):
    from compute_histogram_spark.sources.tables import load
    from compute_histogram_spark.operators.temporal import (
        asof_join_salted,
        epoch_micros,
        ntz_micros,
    )

    events = load(spark, sf_dir, "events")
    orders = load(spark, sf_dir, "orders")
    ev = events.select("event_id", "user_id", epoch_micros(events).alias("tsu"))
    kw = dict(
        left_key="user_id", right_key="o_custkey",
        left_ts=F.col("tsu"), right_ts=ntz_micros("o_orderdate"),
        right_payload={
            "asof_orderkey": F.col("o_orderkey"),
            "asof_totalprice": F.col("o_totalprice"),
        },
        tiebreak=F.col("o_orderkey"),
    )
    plain = T.asof_join(ev, orders, **kw).collect()
    # 1-hour buckets in micros: many buckets per key, heavy stitching
    salted = asof_join_salted(
        ev, orders, **kw, bucket=3_600_000_000
    ).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))
    assert len(plain) > 0
