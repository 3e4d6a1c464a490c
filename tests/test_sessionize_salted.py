"""sessionize_salted must be OUTPUT-IDENTICAL to sessionize — the salt is
a physical-plan change (bounded window partitions for hot users), never a
semantic one. Stressed where it can break: sessions straddling bucket
edges, exact-gap boundaries, and buckets smaller than the gap."""

from pyspark.sql import Row

from compute_histogram_spark.operators.windows import (
    US_PER_S,
    sessionize,
    sessionize_salted,
)
from compute_histogram_spark.sources.tables import load


def _same(a, b):
    return sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_salted_equals_plain_on_real_events(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    assert _same(sessionize(ev), sessionize_salted(ev))


def test_salted_equals_plain_with_tiny_buckets(spark, sf_dir):
    """Buckets SMALLER than the gap force nearly every session to be
    stitched across multiple buckets — the adversarial configuration for
    the merge pass."""
    ev = load(spark, sf_dir, "events")
    assert _same(
        sessionize(ev, gap_s=7200),
        sessionize_salted(ev, gap_s=7200, bucket_s=600),
    )


def test_boundary_stitching_golden(spark):
    gap_s, bucket_s = 100, 1000
    bkt = bucket_s * US_PER_S

    def ev(eid, uid, us):
        return Row(user_id=uid, event_id=eid, ts=us * 1000)  # nanos BIGINT

    rows = [
        # u1: two events straddling the bucket edge, 50 s apart -> ONE
        # session crossing buckets 0 and 1
        ev(1, 1, bkt // 1000 * 1000 - 30 * US_PER_S),
        ev(2, 1, bkt // 1000 * 1000 + 20 * US_PER_S),
        # u1 later: exactly gap apart across an edge -> still one session
        # (the rule is strictly-greater-than-gap splits)
        ev(3, 1, 3 * bkt - 50 * US_PER_S),
        ev(4, 1, 3 * bkt + 50 * US_PER_S),
        # u1: gap + 1us across an edge -> split
        ev(5, 1, 5 * bkt - 50 * US_PER_S),
        ev(6, 1, 5 * bkt + 50 * US_PER_S + 1),
        # u2: ONE session chained ACROSS THREE buckets by 90 s hops
        # (960 s .. 2040 s with 1000 s buckets)
        *[
            ev(100 + i, 2, (960 + 90 * i) * US_PER_S)
            for i in range(13)
        ],
    ]
    df = spark.createDataFrame(rows)
    plain = sessionize(df, gap_s=gap_s)
    salted = sessionize_salted(df, gap_s=gap_s, bucket_s=bucket_s)
    assert _same(plain, salted)
    got = {
        (r["user_id"], r["session_id"]): r["n_events"]
        for r in salted.collect()
    }
    assert got == {(1, 1): 2, (1, 2): 2, (1, 3): 1, (1, 4): 1, (2, 1): 13}
