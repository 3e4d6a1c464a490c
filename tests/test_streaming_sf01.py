"""Streaming paths driven by the REAL driver testdata at sf0.1.

The fixture-scale streaming tests (test_streaming.py) pin semantics; this
module pins the *schema contract* in streaming land: the r03/r04 outage
came from the driver's events.ts layout drifting (epoch-nanos BIGINT ->
TIMESTAMP_NTZ) and was caught only on the batch path. Reading the actual
/root/testdata/sf0.1 file through readStream exercises the streaming
schema-inference + dtype-dispatching time expressions against whatever
layout the driver currently ships, so the next drift breaks HERE first.
"""

import os
import shutil

import pytest

from compute_histogram_spark.sources.tables import load
from compute_histogram_spark.streaming.stream_ops import (
    read_events_stream,
    run_to_completion,
)

SF01 = "/root/testdata/sf0.1"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF01, "events.parquet")),
    reason="driver sf0.1 testdata not present",
)


@pytest.fixture(scope="module")
def sf01_stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream_sf01")
    shutil.copy(os.path.join(SF01, "events.parquet"), d / "part-0.parquet")
    return str(d)


def test_streaming_drift_sf01_equals_batch(spark, sf01_stream_dir):
    """PSI drift monitor over the real 100k-row events file: the last
    streaming report must equal the batch distribution_drift PSI exactly
    (identical smoothing + rounding arithmetic)."""
    from pyspark.sql import functions as F

    from compute_histogram_spark.operators.profile import distribution_drift
    from compute_histogram_spark.streaming.stream_ops import (
        streaming_distribution_drift,
    )

    ev = load(spark, SF01, "events")
    ref = ev.where(F.col("event_type") != "purchase")
    ref_counts = {
        r["bin"]: r["n"]
        for r in ref.where(F.col("value").isNotNull() & ~F.isnan("value"))
        .groupBy(F.floor(F.col("value") / 50.0).cast("bigint").alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    stream = read_events_stream(spark, sf01_stream_dir)
    q, reports = streaming_distribution_drift(stream, ref_counts)
    q.awaitTermination()
    assert reports, "no micro-batch reports"
    batch_rows = distribution_drift(ref, ev).collect()
    batch_psi = round(sum(r["psi_term"] for r in batch_rows), 6)
    assert abs(reports[-1][1] - batch_psi) < 1e-6, (reports[-1], batch_psi)


def test_streaming_stateful_user_stats_sf01_matches_batch(
    spark, sf01_stream_dir
):
    """applyInPandasWithState user aggregates over the real sf0.1 events:
    converged streaming state == batch groupBy answer for every user."""
    from pyspark.sql import functions as F

    from compute_histogram_spark.streaming.stream_ops import (
        streaming_user_stats,
    )

    # foreachBatch keeps the LAST update per user — the converged state.
    final = {}

    def sink(df, _epoch):
        for r in df.collect():
            final[r["user_id"]] = (r["n_events"], round(r["sum_value"], 2))

    q = (
        streaming_user_stats(read_events_stream(spark, sf01_stream_dir))
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    v = F.col("value")
    batch = {
        r["user_id"]: (r["n"], round(r["s"] / 100.0, 2))
        for r in load(spark, SF01, "events")
        .where(v.isNotNull() & ~F.isnan(v))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # cents before summing — the state's order-independent integer
            # arithmetic, mirrored exactly
            F.sum(F.round(v * 100).cast("bigint")).alias("s"),
        )
        .collect()
    }
    assert len(batch) > 0
    assert final == batch


def test_streaming_windowed_histogram_sf01_equals_batch(
    spark, sf01_stream_dir
):
    """Watermarked windowed histogram over the real sf0.1 file — the
    time-bucketing twin that broke in r03 when ts went NTZ."""
    from compute_histogram_spark.operators.windows import windowed_histogram
    from compute_histogram_spark.streaming.stream_ops import (
        streaming_windowed_histogram,
    )

    out = run_to_completion(
        streaming_windowed_histogram(
            read_events_stream(spark, sf01_stream_dir)
        ),
        "s_histo_sf01",
    ).collect()
    batch = windowed_histogram(load(spark, SF01, "events")).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, batch))
    assert len(out) > 0
