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


def distribution_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str = "value",
    bin_width: float = 50.0,
) -> DataFrame:
    """Population-stability-index (PSI) drift report between a reference
    and a current sample of the same metric — the monitoring pass a
    training-data pipeline runs per ingest batch to catch distribution
    shift before it reaches a model.

    Both sides reuse the engine's floor-bucket transform (SURVEY §2.2 A5);
    a full outer join on the bin aligns the two histograms, absent bins
    count 0, and every per-bin term uses additive 0.5 smoothing so empty
    bins neither divide by zero nor explode the score. All inputs to the
    float expression are exact integer counts; the one float computation
    is rounded to 6 — the same cross-engine-exactness discipline as BM25.

    -> (bin BIGINT, bin_value DOUBLE, n_ref BIGINT, n_cur BIGINT,
        psi_term DOUBLE) ordered by bin; ``sum(psi_term)`` is the PSI
    (rule of thumb: <0.1 stable, 0.1-0.25 moderate shift, >0.25 major).

    Scale: two partial->final histogram aggregations (each shuffles
    O(partitions x bins) pre-counted rows) + one bin-keyed join of two
    bin-sized tables + two scalar totals broadcast back. The raw data is
    scanned once per side; nothing row-sized crosses a shuffle.
    """
    v = F.col(value_col)

    def histo(df: DataFrame) -> DataFrame:
        return (
            df.where(v.isNotNull() & ~F.isnan(v))
            .groupBy(
                F.floor(v / bin_width).cast("bigint").alias("bin")
            )
            .agg(F.count(F.lit(1)).alias("n"))
        )

    h_ref = histo(ref).withColumnRenamed("n", "n_ref")
    h_cur = histo(cur).withColumnRenamed("n", "n_cur")
    joined = (
        h_ref.join(h_cur, "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    totals = joined.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur"),
        F.count(F.lit(1)).alias("n_bins"),
    )
    # smoothed shares: (n + 0.5) / (total + 0.5 * n_bins) — integers in,
    # one rounded double out
    return (
        joined.crossJoin(F.broadcast(totals))
        .select(
            "bin",
            (F.col("bin") * bin_width).alias("bin_value"),
            "n_ref",
            "n_cur",
            F.round(
                (
                    (F.col("n_cur") + 0.5) / (F.col("t_cur") + 0.5 * F.col("n_bins"))
                    - (F.col("n_ref") + 0.5) / (F.col("t_ref") + 0.5 * F.col("n_bins"))
                )
                * F.log(
                    ((F.col("n_cur") + 0.5) / (F.col("t_cur") + 0.5 * F.col("n_bins")))
                    / ((F.col("n_ref") + 0.5) / (F.col("t_ref") + 0.5 * F.col("n_bins")))
                ),
                6,
            ).alias("psi_term"),
        )
        .orderBy("bin")
    )


def robust_outliers(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    threshold: float = 3.5,
) -> DataFrame:
    """Per-group robust outlier report via the modified z-score
    ``0.6745 * |x - median| / MAD`` (Iglewicz & Hoaglin 1993) — the
    ingest-side anomaly pass that survives the outliers it hunts
    (mean/stddev z-scores are dragged by the very tails they flag).

    Three aggregation passes, all partial->final with group-cardinality-
    bounded shuffles: per-group exact ``median``; per-group MAD after a
    broadcast join of the medians onto the rows; then the flagged count in
    one final aggregation after broadcasting the (tiny) MAD table back.
    The raw data is scanned per pass — medians cannot fuse with their own
    deviations. Zero-MAD groups (constant values) report 0 outliers
    rather than dividing by zero. median/MAD round to 6 so the DuckDB
    twin hash-matches.

    -> (group, n_rows, median, mad, n_outliers) ordered by group.
    """
    v = F.col(value_col)
    clean = df.where(v.isNotNull() & ~F.isnan(v)).select(
        F.col(group_col).alias("group"), v.alias("x")
    )
    med = clean.groupBy("group").agg(
        F.round(F.median("x"), 6).alias("median")
    )
    dev = clean.join(F.broadcast(med), "group").withColumn(
        "adev", F.abs(F.col("x") - F.col("median"))
    )
    mad = dev.groupBy("group").agg(F.round(F.median("adev"), 6).alias("mad"))
    flagged = F.when(
        (F.col("mad") > 0)
        & (0.6745 * F.col("adev") / F.col("mad") > F.lit(threshold)),
        1,
    )
    return (
        dev.join(F.broadcast(mad), "group")
        .groupBy("group")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.first("median").alias("median"),
            F.first("mad").alias("mad"),
            F.count(flagged).alias("n_outliers"),
        )
        .orderBy("group")
    )
