"""The flagship operator: distributed histogram over a numeric column.

Reference dataflow (SURVEY §3 EP1): catalog scan -> (pass 1) global min/max
-> driver bin planning -> (pass 2) per-tile NaN-filter + bin transform +
partial histogram -> driver merge -> labeled dense table.

Spark-first re-expression: both passes are single DataFrame plans.

- pass 1 (main.py:127-149, 206-219): ``df.agg(min, max)`` — Catalyst emits
  partial min/max per input partition and one tiny final merge; the
  reference's ``Pool.map`` + driver fold is exactly this, hand-rolled.
- pass 2 (main.py:82-124, 182-203, 244-249): ``filter(not nan) ->
  project(bin key) -> groupBy(bin).count()``. HashAggregate's
  partial->shuffle->final IS ``np.histogram`` per tile + ``h1 + h2`` merge;
  the shuffle moves at most one row per (input-partition, bin) thanks to
  map-side partial aggregation, so at 100 TB the shuffled volume is
  O(partitions x bins), independent of row count.
- the dense zero-filled vector the reference materializes (main.py:111-119,
  golden test test/test_histogram.py:14) is recovered by left-joining a
  ``spark.range(lo, hi)`` bin spine against the (sparse) counts; the counts
  side is at most ``bins`` rows post-aggregation, so it is broadcast.

Nothing is ever collected on the driver except the 2-row min/max result.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import broadcast

from compute_histogram_spark.plans.bin_scheme import BinScheme, LINEAR

# Above this many bins we skip the broadcast hint on the counts side and let
# AQE pick the join strategy (a >50M-bin histogram is degenerate anyway).
_BROADCAST_BIN_LIMIT = 5_000_000


def _valid(col: Column) -> Column:
    """NaN/NULL pixel filter — ``w[~np.isnan(w)]`` (main.py:241)."""
    return col.isNotNull() & ~F.isnan(col)


def bin_counts(
    df: DataFrame,
    key_col: str,
    lo: int,
    hi: int,
    dense: bool = True,
) -> DataFrame:
    """Core histogram kernel over *integer bin keys* -> ``(bin, pixel_count)``.

    Distributed twin of ``_compute_histogram(w, bins, range)`` =
    ``np.histogram(w, bins, range)[0]`` with unit-width integer bins
    (main.py:248-249): keys outside ``[lo, hi]`` are dropped, the last bin
    ``[hi-1, hi]`` is closed (key == hi counts into it), all others are
    half-open. ``dense=True`` zero-fills via a ``spark.range`` spine join —
    the reference's golden output asserts zero bins (test_histogram.py:14).
    """
    k = F.col(key_col)
    counts = (
        df.where((k >= F.lit(lo)) & (k <= F.lit(hi)))
        .select(F.least(k, F.lit(hi - 1)).cast("bigint").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("pixel_count"))
    )
    if not dense:
        return counts
    spark = df.sparkSession
    spine = spark.range(lo, hi).toDF("bin")
    rhs = broadcast(counts) if (hi - lo) <= _BROADCAST_BIN_LIMIT else counts
    return spine.join(rhs, "bin", "left").select(
        "bin", F.coalesce("pixel_count", F.lit(0)).cast("bigint").alias("pixel_count")
    )


def compute_min_max(
    df: DataFrame, col: str, ref_compat: bool = False
) -> tuple[float, float]:
    """Pass 1: global min/max (main.py:127-149).

    ``ref_compat=True`` reproduces the reference's zero-seeded accumulators
    (``min_value = 0; max_value = 0`` — main.py:131-132), i.e. it returns
    ``min(0, data_min), max(0, data_max)``. Empty/all-NaN input folds to the
    seed exactly like the reference's ``None``-skip (main.py:139-144);
    without ref_compat an empty input raises.
    """
    c = F.col(col)
    row = df.where(_valid(c)).agg(
        F.min(c).alias("mn"), F.max(c).alias("mx")
    ).first()
    mn, mx = row["mn"], row["mx"]
    if ref_compat:
        mn = 0.0 if mn is None else min(0.0, float(mn))
        mx = 0.0 if mx is None else max(0.0, float(mx))
        return mn, mx
    if mn is None:
        raise ValueError(f"column {col!r} has no non-NaN values")
    return float(mn), float(mx)


def histogram(
    df: DataFrame,
    col: str,
    method: str = LINEAR,
    min_value: Optional[float] = None,
    max_value: Optional[float] = None,
    ref_compat: bool = False,
    dense: bool = True,
    scheme: Optional[BinScheme] = None,
) -> DataFrame:
    """Full histogram pipeline -> DataFrame ``(bin BIGINT, value DOUBLE,
    pixel_count BIGINT)`` ordered by bin.

    Supplying ``min_value``/``max_value`` prunes pass 1 entirely, the same
    plan shortcut as the reference CLI's ``--min_value/--max_value``
    (main.py:53-54, SURVEY §3 EP2). ``dense=False`` skips the zero-fill
    spine join and returns only occupied bins (the scalable form when the
    value range is huge and sparse).
    """
    if scheme is None:
        if min_value is None or max_value is None:
            mn, mx = compute_min_max(df, col, ref_compat=ref_compat)
            min_value = mn if min_value is None else min_value
            max_value = mx if max_value is None else max_value
        scheme = BinScheme.from_min_max(min_value, max_value, method, ref_compat)
    if scheme.bins <= 0:
        # log mode has no ±margin (main.py:166-172), so a constant/near-
        # constant column yields lo == hi. np.histogram(bins=0) raises in
        # the reference; silently returning an empty histogram would LOSE
        # every row, so fail loudly here too.
        raise ValueError(
            f"degenerate bin scheme ({scheme.method}: lo={scheme.lo} >= "
            f"hi={scheme.hi}); the value spread is too narrow for this "
            "method — supply explicit min_value/max_value or use linear"
        )

    c = F.col(col)
    keys = df.where(_valid(c)).select(scheme.bin_key_expr(c).alias("k"))
    out = bin_counts(keys, "k", scheme.lo, scheme.hi, dense=dense)

    return (
        out.select(
            F.col("bin").cast("bigint").alias("bin"),
            scheme.label_expr(F.col("bin")).alias("value"),
            F.col("pixel_count").cast("bigint").alias("pixel_count"),
        )
        .orderBy("bin")
    )


def merge_histograms(h1: DataFrame, h2: DataFrame) -> DataFrame:
    """Element-wise merge of partial histograms — ``h1 + h2``
    (main.py:244-245, driver fold main.py:100-108).

    In Spark the merge IS the final aggregation stage; this standalone form
    (union -> sum) exists for incremental workloads that persist partial
    histograms (e.g. per-day) and later combine them — associative and
    commutative, so any combination tree is valid (golden: test F2).
    """
    cols = ["bin", "value", "pixel_count"] if "value" in h1.columns else ["bin", "pixel_count"]
    keys = [k for k in cols if k != "pixel_count"]
    return (
        h1.select(cols)
        .unionByName(h2.select(cols))
        .groupBy(keys)
        .agg(F.sum("pixel_count").cast("bigint").alias("pixel_count"))
        .orderBy("bin")
    )
