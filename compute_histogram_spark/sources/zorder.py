"""Z-order (Morton) clustering layout — multi-dimensional data skipping.

The third member of the layout family (bucketing.py: co-located joins;
partitionBy: directory pruning): interleaving the bits of several
columns into one sort key clusters rows so that a range predicate on
ANY of the interleaved columns touches a small fraction of files /
row groups — the property Delta's OPTIMIZE ZORDER and Iceberg's
sort-order rewrite sell, built here from plain DataFrame ops:

    key = interleave(bits of c1, c2, ...)      (pure JVM expressions)
    repartitionByRange(n_files, key)           (one range exchange)
    sortWithinPartitions(key) -> write         (tight row-group stats)

At 100 TB this is a write-once ingest/compaction decision exactly like
bucketing: the range exchange is paid when the table is laid down, and
every later scan with a predicate on any clustered column reads the
min/max-pruned subset. The pruning property is asserted from the
written files' parquet row-group statistics in tests/test_zorder.py —
measured skipping, not a claim.

Normalization: interleaving needs non-negative ints of fixed width.
``minmax_normalize`` maps arbitrary numeric columns onto [0, 2^bits)
with one global min/max aggregate (O(cols) driver scalars — the
model-state collect class); already-bounded ints can skip it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(cols: list[str | Column], bits: int = 16) -> Column:
    """Morton-interleave ``bits`` low bits of each column (non-negative
    ints) into one BIGINT: bit ``i`` of column ``j`` lands at position
    ``i * n + j``. n * bits must fit a signed 64-bit key (<= 62).

    Pure shift/mask/or arithmetic — whole-stage codegen, and simple
    enough that a SQL twin replicates the key verbatim (the staged
    ``zorder_key`` oracle builds the identical expression)."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed int64")
    key = F.lit(0).cast("bigint")
    for j, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        col = col.cast("bigint")
        for i in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(col, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return key


def minmax_normalize(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[DataFrame, list[str]]:
    """Add ``_z_<col>`` columns scaling each input onto [0, 2^bits) by
    its global min/max (one aggregate, O(cols) scalars to the driver).
    Ties at the max clamp to 2^bits - 1. NULL input values map to
    bucket 0 (NULLs cluster together at the low corner rather than
    silently riding least()'s null-skipping up to the max corner and
    poisoning that region's row-group stats). An all-NULL column has
    no min/max to normalize by and raises a clear error — the caller
    should drop it from the clustering key. Returns (df, names)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
    stats = df.agg(*aggs).collect()[0]
    m = (1 << bits) - 1
    out = df
    names = []
    for c in cols:
        if stats[f"mn_{c}"] is None or stats[f"mx_{c}"] is None:
            raise ValueError(
                f"cannot Z-order on all-NULL column {c!r}: no min/max "
                "to normalize by — drop it from the clustering columns"
            )
        lo, hi = float(stats[f"mn_{c}"]), float(stats[f"mx_{c}"])
        span = (hi - lo) or 1.0
        name = f"_z_{c}"
        out = out.withColumn(
            name,
            F.when(
                F.col(c).isNotNull(),
                F.least(
                    F.lit(m),
                    F.floor(
                        (F.col(c).cast("double") - F.lit(lo))
                        / F.lit(span) * F.lit(m + 1)
                    ),
                ),
            ).otherwise(F.lit(0)).cast("bigint"),
        )
        names.append(name)
    return out, names


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 16,
    normalize: bool = True,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``.

    One range exchange on the interleaved key (+ an in-partition sort
    so row-group min/max stats stay tight), then the key is dropped —
    the layout is invisible to readers except through their pruning."""
    if normalize:
        df, zcols = minmax_normalize(df, cols, bits)
    else:
        zcols = list(cols)
    key = zorder_key(zcols, bits)
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey", *[c for c in zcols if c.startswith("_z_")])
        .write.mode("overwrite").parquet(path)
    )
