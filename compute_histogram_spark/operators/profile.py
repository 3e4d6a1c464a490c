"""Data-quality profiling: the ingest-side sanity pass a 100 TB pipeline
runs before anything else touches the data.

- :func:`null_profile` — per-column row/null/NaN/distinct counts in ONE
  aggregation pass: every metric is a conditional count expression, so the
  whole profile is a single scan + a single partial->final HashAggregate
  producing one row, then unpivoted driver-side-free via ``stack``. No
  per-column jobs, no driver loops — profiling cost is one table scan
  regardless of column count.
- :func:`histogram_2d` — bivariate histogram (value x hour-of-day):
  the reference's bin-count kernel (SURVEY §2.2 A5-A7) generalized to a
  composite group key. groupBy on two low-cardinality keys shuffles
  O(partitions x |bins_x| x |bins_y|) rows after map-side partials.

All outputs are BIGINT counts — cross-engine exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType, FloatType

from compute_histogram_spark.operators.temporal import epoch_micros_sql


def null_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """-> (column STRING, n_rows, n_null, n_nan, n_distinct) one row per
    profiled column. ``n_nan`` is 0 for non-floating columns; distinct
    counts are exact (swap in approx_count_distinct at extreme widths)."""
    cols = columns or df.columns
    fields = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        is_float = isinstance(fields[c], (DoubleType, FloatType))
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"null_{c}"))
        aggs.append(
            (
                F.count(F.when(F.isnan(c), 1)) if is_float else F.lit(0).cast("bigint")
            ).alias(f"nan_{c}")
        )
        aggs.append(F.countDistinct(c).alias(f"dist_{c}"))
    row = df.agg(*aggs)
    cells = ", ".join(
        f"'{c}', n_rows, null_{c}, nan_{c}, dist_{c}" for c in cols
    )
    return (
        row.select(
            F.expr(
                f"stack({len(cols)}, {cells}) AS "
                "(column, n_rows, n_null, n_nan, n_distinct)"
            )
        ).orderBy("column")
    )


def histogram_2d(
    events: DataFrame, bin_width: float = 50.0
) -> DataFrame:
    """Bivariate histogram: (hour-of-day, value bin) -> count.

    Hour comes from integer epoch-micros arithmetic (tz-free); the value
    bin reuses the floor-bucket transform. -> (hour INT, bin BIGINT,
    bin_value DOUBLE, n_events BIGINT).
    """
    v = F.col("value")
    tsu = epoch_micros_sql(events)
    return (
        events.where(v.isNotNull() & ~F.isnan(v))
        .select(
            F.expr(f"({tsu}) div 3600000000 % 24").cast("int").alias("hour"),
            F.floor(v / bin_width).cast("bigint").alias("bin"),
        )
        .groupBy("hour", "bin")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "hour", "bin", (F.col("bin") * bin_width).alias("bin_value"), "n_events"
        )
        .orderBy("hour", "bin")
    )
