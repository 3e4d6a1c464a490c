"""Structured Streaming twins of the batch window operators.

The reference is batch-only; these extend its transform->bucket->count shape
to unbounded input (SURVEY §2.4). Each streaming op shares its bucketing
expressions with the batch twin in ``operators/windows.py`` — the batch form
is what the DuckDB oracle checks; the streaming form is verified in tests by
running a file stream to completion (``availableNow``) and diffing against
the batch result, which must be identical for a finite input.

Scale/semantics notes:

- event time = ``timestamp_micros(ts div 1000)`` from the epoch-nanos BIGINT.
- ``withWatermark`` bounds state: bins/windows older than the watermark are
  finalized and evicted — without it, state grows with the key space
  forever. Late rows beyond the watermark are dropped (documented, tested).
- tumbling ``window()`` aggregation is incremental partial aggregation per
  micro-batch + state-store merge: the streaming analog of the partial/final
  histogram merge (main.py:244-249).
- ``session_window`` is Spark's native gap-session state machine; the batch
  lag/cumsum twin (operators/windows.py:sessionize) has identical semantics
  for a static gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# events schema under spark.sql.legacy.parquet.nanosAsLong=true
EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # epoch nanos
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over an events parquet directory. New files are
    discovered per micro-batch — the standard landing-zone pattern."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def _event_time(df: DataFrame) -> DataFrame:
    return df.withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))


def streaming_windowed_histogram(
    stream: DataFrame,
    window_s: int = 600,
    bin_width: float = 50.0,
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling-window value histogram over a stream."""
    return (
        _event_time(stream)
        .withWatermark("event_time", watermark)
        .groupBy(
            F.window("event_time", f"{window_s} seconds").alias("win"),
            F.floor(F.col("value") / bin_width).cast("bigint").alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").cast("long").alias("window_start_s"),
            "bin",
            (F.col("bin") * bin_width).alias("bin_value"),
            "n_events",
        )
    )


def streaming_sessionize(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based sessions via the native session_window state machine."""
    return (
        _event_time(stream)
        .withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap).alias("sw"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").cast("long").alias("session_start_s"),
            F.col("sw.end").cast("long").alias("session_end_s"),
            "n_events",
        )
    )


def run_to_completion(
    result: DataFrame, query_name: str, mode: str = "complete"
) -> DataFrame:
    """Drain a finite stream (availableNow) into a memory sink and return
    the materialized result. Test/debug helper — production writes go to a
    real sink (kafka/parquet/delta) with ``trigger(processingTime=...)``."""
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return result.sparkSession.table(query_name)
