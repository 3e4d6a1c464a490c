"""Funnel ordering semantics and weekly cohort retention on tiny synthetic
events (ts in epoch-nanos BIGINT, matching the nanosAsLong events schema)."""

from pyspark.sql import Row

from compute_histogram_spark.operators import behavior as BH

NS_PER_DAY = 86_400 * 10**9


def _ev(uid, etype, day):
    return Row(user_id=uid, event_type=etype, ts=day * NS_PER_DAY)


def test_funnel_requires_strict_stage_order(spark):
    rows = [
        # u1: full ordered funnel
        _ev(1, "view", 1), _ev(1, "click", 2), _ev(1, "purchase", 3),
        # u2: click BEFORE first view -> reaches only 'view'
        _ev(2, "click", 1), _ev(2, "view", 2), _ev(2, "purchase", 3),
        # u3: view only
        _ev(3, "view", 5),
        # u4: purchase without view -> reaches nothing
        _ev(4, "purchase", 1),
        # u5: view then click, purchase missing
        _ev(5, "view", 1), _ev(5, "click", 4),
    ]
    out = BH.conversion_funnel(spark.createDataFrame(rows)).collect()
    got = {r["stage"]: (r["n_users"], r["conversion"]) for r in out}
    assert got["view"] == (4, 1.0)
    assert got["click"] == (2, 0.5)
    assert got["purchase"] == (1, 0.25)
    assert [r["stage_idx"] for r in out] == [0, 1, 2]


def test_funnel_uses_first_occurrence_per_stage(spark):
    # u1's FIRST click (day 1) precedes the first view (day 2); a later
    # click (day 3) must NOT resurrect the funnel — first-touch semantics
    rows = [
        _ev(1, "click", 1), _ev(1, "view", 2), _ev(1, "click", 3),
        _ev(1, "purchase", 4),
    ]
    out = BH.conversion_funnel(spark.createDataFrame(rows)).collect()
    got = {r["stage"]: r["n_users"] for r in out}
    assert got == {"view": 1, "click": 0, "purchase": 0}


def test_cohort_retention_weekly(spark):
    rows = [
        # u1 first active week 0, returns week 1 and 3
        _ev(1, "view", 1), _ev(1, "click", 8), _ev(1, "view", 22),
        # u2 first active week 0 only
        _ev(2, "view", 2),
        # u3 first active week 1, returns week 2
        _ev(3, "view", 8), _ev(3, "view", 15),
    ]
    out = BH.cohort_retention(spark.createDataFrame(rows)).collect()
    w0 = 0
    w1 = 7 * 86_400
    got = {(r["cohort_week_start_s"], r["week_offset"]): r["n_users"] for r in out}
    assert got == {
        (w0, 0): 2,
        (w0, 1): 1,
        (w0, 3): 1,
        (w1, 0): 1,
        (w1, 1): 1,
    }


def test_session_concurrency_matches_duckdb_sweep(spark, sf_dir):
    import duckdb

    from compute_histogram_spark.operators.behavior import session_concurrency
    from compute_histogram_spark.operators.windows import sessionize

    from compute_histogram_spark.sources.tables import load

    sess = sessionize(load(spark, sf_dir, "events"))
    got = session_concurrency(sess).toPandas()
    con = duckdb.connect()
    con.register("sess", sess.toPandas())
    want = con.execute("""
        WITH d AS (
            SELECT start_us AS ts_us, 1 AS d FROM sess
            UNION ALL SELECT end_us + 1, -1 FROM sess
        ),
        g AS (SELECT ts_us, sum(d) AS d FROM d GROUP BY ts_us)
        SELECT ts_us, CAST(sum(d) OVER (ORDER BY ts_us) AS BIGINT) AS n_active
        FROM g ORDER BY ts_us
    """).df()
    assert len(got) == len(want) > 0
    assert (got["ts_us"].values == want["ts_us"].values).all()
    assert (got["n_active"].values == want["n_active"].values).all()
    # the sweep is conservative: every delta closes, the curve ends at 0
    assert got["n_active"].iloc[-1] == 0
    assert (got["n_active"] >= 0).all()


def test_session_concurrency_brute_force_small(spark):
    from pyspark.sql import Row

    from compute_histogram_spark.operators.behavior import (
        peak_concurrency,
        session_concurrency,
    )

    iv = [(0, 100), (50, 150), (100, 200), (300, 400), (120, 130),
          (95, 105), (398, 401)]
    sess = spark.createDataFrame(
        [Row(user_id=i, session_id=1, start_us=a, end_us=b)
         for i, (a, b) in enumerate(iv)]
    )
    curve = session_concurrency(sess, bucket_s=1).collect()  # 1s buckets
    for r in curve:
        t = r["ts_us"]
        brute = sum(1 for a, b in iv if a <= t <= b)
        assert r["n_active"] == brute, (t, r["n_active"], brute)
    # peaks per 100-microsecond-bucket... use bucket_s such that
    # bucket_us=100: bucket_s = 100/1e6 not int — use brute force against
    # the curve instead for a 1-hour bucket (all intervals in bucket 0)
    peaks = {r["bucket_start_s"]: r["peak_active"]
             for r in peak_concurrency(sess).collect()}
    assert peaks[0] == max(
        sum(1 for a, b in iv if a <= t <= b)
        for t in {x for a, b in iv for x in (a, b)}
    )


def test_peak_concurrency_matches_duckdb_sweep(spark, sf_dir):
    import duckdb

    from compute_histogram_spark.operators.behavior import peak_concurrency
    from compute_histogram_spark.operators.windows import sessionize
    from compute_histogram_spark.sources.tables import load

    sess = sessionize(load(spark, sf_dir, "events"))
    got = {r["bucket_start_s"]: r["peak_active"]
           for r in peak_concurrency(sess, bucket_s=3600).collect()}
    con = duckdb.connect()
    con.register("sess", sess.toPandas())
    # oracle: global sweep curve, then per-bucket max of (levels inside
    # the bucket) and (level carried in = last level of any earlier point)
    want = {int(r[0]): int(r[1]) for r in con.execute("""
        WITH d AS (
            SELECT start_us AS ts_us, 1 AS d FROM sess
            UNION ALL SELECT end_us + 1, -1 FROM sess
        ),
        g AS (SELECT ts_us, sum(d) AS d FROM d GROUP BY ts_us),
        curve AS (
            SELECT ts_us, CAST(sum(d) OVER (ORDER BY ts_us) AS BIGINT) AS n,
                   ts_us // 3600000000 AS bkt
            FROM g
        ),
        per AS (
            SELECT bkt, max(n) AS peak_inside,
                   arg_max(n, ts_us) AS exit_level
            FROM curve GROUP BY bkt
        )
        SELECT bkt * 3600 AS bucket_start_s,
               greatest(peak_inside,
                        coalesce(lag(exit_level) OVER (ORDER BY bkt), 0))
                   AS peak_active
        FROM per ORDER BY bucket_start_s
    """).fetchall()}
    assert got == want and len(got) > 0
