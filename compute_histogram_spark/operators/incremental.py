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

from pyspark.sql import DataFrame, functions as F
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
