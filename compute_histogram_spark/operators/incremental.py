"""Delta-style incremental histogram maintenance.

The reference recomputes its histogram from scratch every run (two full
passes over all tiles, main.py:54,57). Because the histogram's aggregation
state — the sparse ``(bin, pixel_count)`` relation — is associative and
commutative under element-wise addition (``_add_histogram``, main.py:244-245),
it can instead be maintained INCREMENTALLY: keep the per-delta partial
states, and on each new batch of data aggregate only the delta and merge it
into the persisted state. At 100 TB this turns "rescan everything" into
"scan today's partition + merge k-row states": the merge input is bounded by
O(deltas x occupied_bins), independent of total row count.

Requirement: the bin scheme must be FIXED up front (the reference's
``--min_value/--max_value`` one-pass mode, main.py:53-54) — partial states
binned under different schemes are not mergeable. ``delta_counts`` therefore
takes an explicit :class:`BinScheme`.

Layout note for real deployments: persist states partitioned by delta id
(``partitionBy('delta')``) so re-merging after a late-arriving correction
prunes to the affected delta directories.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.functions import broadcast

from compute_histogram_spark.operators.histogram import _valid, bin_counts
from compute_histogram_spark.plans.bin_scheme import BinScheme


def delta_counts(df: DataFrame, col: str, scheme: BinScheme) -> DataFrame:
    """Partial histogram state for one delta -> sparse ``(bin, pixel_count)``.

    Exactly the reference's per-tile ``np.histogram`` partial (main.py:248-249)
    lifted to a whole delta: NaN-filter -> bin-key transform -> sparse counts.
    """
    c = F.col(col)
    keys = df.where(_valid(c)).select(scheme.bin_key_expr(c).alias("k"))
    return bin_counts(keys, "k", scheme.lo, scheme.hi, dense=False)


def delta_counts_tagged(
    df: DataFrame, col: str, scheme: BinScheme, delta: Column
) -> DataFrame:
    """Per-delta partial states from ONE scan of ``df`` ->
    ``(delta, bin, pixel_count)``.

    Value-identical to running :func:`delta_counts` once per delta value
    over ``df.where(delta == i)`` (each ``(delta, bin)`` group counts
    exactly the rows the per-delta filter would keep), but the input is
    scanned once instead of once per delta — the r16 optimization-round
    rewrite (guide §2.3 "aggregate before you shuffle" / §1.2 fewer
    passes). Each delta's state remains an independent, mergeable group;
    callers restrict ``delta`` to the intended domain themselves (a
    filter on the tag column), exactly as they previously chose which
    per-delta filters to run.
    """
    c = F.col(col)
    k = F.col("__k")
    keys = df.where(_valid(c)).select(
        delta.alias("delta"), scheme.bin_key_expr(c).alias("__k")
    )
    return (
        keys.where((k >= F.lit(scheme.lo)) & (k <= F.lit(scheme.hi)))
        .select(
            "delta",
            F.least(k, F.lit(scheme.hi - 1)).cast("bigint").alias("bin"),
        )
        .groupBy("delta", "bin")
        .agg(F.count(F.lit(1)).alias("pixel_count"))
    )


def merge_states(*states: DataFrame) -> DataFrame:
    """Element-wise sum of partial states (main.py:100-108 driver fold).

    Union-all then one hash aggregation: each state is at most
    ``scheme.bins`` rows post-aggregation, so the shuffle is tiny no matter
    how much raw data each state summarizes.
    """
    if not states:
        raise ValueError("merge_states needs at least one state")
    u = reduce(
        lambda a, b: a.unionByName(b),
        [s.select("bin", "pixel_count") for s in states],
    )
    return u.groupBy("bin").agg(
        F.sum("pixel_count").cast("bigint").alias("pixel_count")
    )


def finalize(state: DataFrame, scheme: BinScheme, dense: bool = True) -> DataFrame:
    """Merged state -> labeled output ``(bin, value, pixel_count)``.

    Same dense zero-filled spine + inverse label transform as the one-shot
    pipeline (main.py:110-119): the state side is post-aggregation (<= bins
    rows), so it broadcasts against the ``spark.range`` spine.
    """
    if dense:
        spine = state.sparkSession.range(scheme.lo, scheme.hi).toDF("bin")
        state = spine.join(broadcast(state), "bin", "left").select(
            "bin", F.coalesce("pixel_count", F.lit(0)).alias("pixel_count")
        )
    return state.select(
        F.col("bin").cast("bigint").alias("bin"),
        scheme.label_expr(F.col("bin")).alias("value"),
        F.col("pixel_count").cast("bigint").alias("pixel_count"),
    ).orderBy("bin")


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key_col: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """CDC MERGE: apply an upsert/delete change-set to a keyed snapshot.

    The same incremental-maintenance idea as the histogram states, applied
    to a *keyed table* instead of an aggregate: rather than rebuilding the
    snapshot from the full history, fold in only the day's changes.
    ``changes`` carries every snapshot column plus ``seq`` (monotone change
    order) and ``op`` ('u' = upsert, 'd' = delete). Semantics (MERGE INTO):

    - per key, the HIGHEST ``seq`` change wins; on a seq tie the delete
      wins ('d' < 'u' in the tiebreak order — deterministic, and the safe
      default for at-least-once change feeds);
    - winning 'u' replaces (or inserts) the key's row;
    - winning 'd' removes the key;
    - keys with no change pass through untouched.

    Plan shape, sized for "100 TB snapshot, small daily delta":

    1. one window over CHANGES only (shuffle of the delta, never the
       snapshot) picks the winner per key;
    2. ``left_anti`` join snapshot -> winner keys: with a day-sized delta
       AQE plans this as a broadcast anti join, so the snapshot is a pure
       map-side scan — ZERO snapshot shuffle end to end;
    3. union the winning upserts.

    For deltas too big to broadcast, write both sides bucketed by the key
    (sources/bucketing.py) and the anti join is a zero-Exchange sort-merge.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(seq_col).desc(), F.col(op_col).asc()
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    keep = snapshot.join(latest.select(key_col), key_col, "left_anti")
    ups = latest.where(F.col(op_col) == "u").select(*snapshot.columns)
    return keep.unionByName(ups)


def orders_upsert_demo(orders: DataFrame) -> DataFrame:
    """Concrete MERGE twin on the orders table, with a deterministic
    synthetic change feed exercising every branch: keys ``%17 == 3`` get an
    early upsert (seq 1) overridden by a delete (seq 2); keys ``%17 == 5``
    get a delete (seq 1) overridden by a +1.00 repricing upsert (seq 2).
    Returns the merged snapshot (orderkey, totalprice)."""
    snap = orders.select("o_orderkey", "o_totalprice")
    m = F.col("o_orderkey") % 17
    base = orders.where(m.isin(3, 5)).select(
        "o_orderkey", "o_totalprice", m.alias("__m")
    )
    c1 = base.select(
        "o_orderkey",
        F.when(F.col("__m") == 3, F.col("o_totalprice") + 5.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.lit(1).alias("seq"),
        F.when(F.col("__m") == 3, F.lit("u")).otherwise(F.lit("d")).alias("op"),
    )
    c2 = base.select(
        "o_orderkey",
        (F.col("o_totalprice") + 1.0).alias("o_totalprice"),
        F.lit(2).alias("seq"),
        F.when(F.col("__m") == 3, F.lit("d")).otherwise(F.lit("u")).alias("op"),
    )
    out = apply_changes(snap, c1.unionByName(c2), key_col="o_orderkey")
    return out.orderBy("o_orderkey")
