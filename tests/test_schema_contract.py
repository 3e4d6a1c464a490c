"""Schema contract against the DRIVER'S REAL parquet testdata.

The round-3 regression (events.ts silently moved from epoch-nanos BIGINT to
timestamp[us] / TIMESTAMP_NTZ) went undetected for two rounds because every
behavioral test ran on hand-built fixtures using the OLD layout. These tests
pin the contract the production queries actually depend on:

1. every table in TESTDATA.md loads via ``sources.tables.load``;
2. the time columns carry a dtype ``epoch_micros_sql`` can dispatch on, and
   one ts-dependent query per time-bearing table runs end-to-end on the
   real files;
3. Spark's epoch-micros extraction agrees EXACTLY with DuckDB's
   ``epoch_us`` on the same parquet — the cross-engine invariant the whole
   oracle gate rests on;
4. the dispatch is genuinely polymorphic: the same events rendered as
   TIMESTAMP_NTZ and as legacy nanos-BIGINT produce identical operator
   output.

If the driver's schema drifts again, these fail loudly on the next pytest
run instead of surfacing as 8 dead CORRECTNESS rows a round later.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

from compute_histogram_spark.operators import behavior as BH
from compute_histogram_spark.operators import windows as W
from compute_histogram_spark.operators.profile import histogram_2d
from compute_histogram_spark.operators.temporal import (
    asof_enrich_events,
    epoch_micros,
    epoch_micros_sql,
)
from compute_histogram_spark.sources.tables import TABLES, load

TIME_COLS = {"events": "ts", "orders": "o_orderdate", "lineitem": "l_shipdate"}
DISPATCHABLE = (TimestampNTZType, TimestampType, LongType)


def test_all_tables_load(spark, sf_dir):
    for t in TABLES:
        df = load(spark, sf_dir, t)
        assert len(df.columns) > 0, t
        assert df.limit(1).count() == 1, f"{t} is empty"


@pytest.mark.parametrize("table,col", sorted(TIME_COLS.items()))
def test_time_columns_dispatchable(spark, sf_dir, table, col):
    df = load(spark, sf_dir, table)
    dt = df.schema[col].dataType
    assert isinstance(dt, DISPATCHABLE), f"{table}.{col} undispatchable: {dt}"
    # extracted micros must land in a sane epoch range (1990..2100) — guards
    # against a units regression (nanos read as micros = year ~52000)
    lo, hi = 631_152_000_000_000, 4_102_444_800_000_000
    row = df.select(
        F.min(epoch_micros(df, col)).alias("lo"),
        F.max(epoch_micros(df, col)).alias("hi"),
    ).first()
    assert lo < row["lo"] <= row["hi"] < hi, (table, col, row)


def test_epoch_micros_matches_duckdb_exactly(spark, sf_dir):
    """min/max/sum of epoch micros agree bit-for-bit with DuckDB epoch_us —
    the invariant every time-bucketed oracle comparison relies on."""
    ev = load(spark, sf_dir, "events")
    s = ev.select(
        F.min(epoch_micros(ev)).alias("lo"),
        F.max(epoch_micros(ev)).alias("hi"),
        F.sum(epoch_micros(ev)).alias("total"),
    ).first()
    o = duckdb.sql(
        "SELECT min(epoch_us(ts)) lo, max(epoch_us(ts)) hi,"
        f" sum(epoch_us(ts))::HUGEINT total FROM '{sf_dir}/events.parquet'"
    ).fetchone()
    assert (s["lo"], s["hi"], int(s["total"])) == (o[0], o[1], int(o[2]))


def test_ts_queries_run_on_real_events(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    assert W.sessionize(ev).limit(1).count() == 1
    assert W.windowed_histogram(ev).limit(1).count() == 1
    assert BH.cohort_retention(ev).limit(1).count() == 1
    assert histogram_2d(ev).limit(1).count() == 1


def test_ts_query_runs_on_real_orders(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    orders = load(spark, sf_dir, "orders")
    assert asof_enrich_events(ev, orders).limit(1).count() == 1


def _both_layouts(spark, rows):
    """The same (user_id, event_id, value, micros) events as NTZ and as
    legacy nanos-BIGINT DataFrames."""
    base = spark.createDataFrame(
        [Row(user_id=u, event_id=e, value=v, us=us) for u, e, v, us in rows]
    )
    ntz = base.withColumn(
        "ts", F.expr("timestampadd(MICROSECOND, us, TIMESTAMP_NTZ '1970-01-01')")
    ).drop("us")
    nanos = base.withColumn("ts", (F.col("us") * 1000).cast("long")).drop("us")
    assert isinstance(ntz.schema["ts"].dataType, TimestampNTZType)
    assert isinstance(nanos.schema["ts"].dataType, LongType)
    return ntz, nanos


def test_dispatch_is_layout_polymorphic(spark):
    hour = 3_600_000_000
    rows = [
        (1, 1, 10.0, 1 * hour),
        (1, 2, 20.0, 1 * hour + 5),          # same-window tiebreak
        (1, 3, 250.0, 3 * hour),             # >30 min gap -> new session
        (2, 4, 75.0, 2 * hour),
        (2, 5, float("nan"), 26 * hour),     # NaN filtered by histograms
        (2, 6, 99.0, 24 * 7 * hour + 1),     # next epoch-week
    ]
    ntz, nanos = _both_layouts(spark, rows)
    for op in (
        W.sessionize,
        W.windowed_histogram,
        lambda df: df.withColumn("event_type", F.lit("view")).transform(
            BH.cohort_retention
        ),
        histogram_2d,
    ):
        a = sorted(map(tuple, op(ntz).collect()))
        b = sorted(map(tuple, op(nanos).collect()))
        assert a == b and a, op
