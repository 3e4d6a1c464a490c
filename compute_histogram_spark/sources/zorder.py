"""Z-order (Morton-curve) clustered layout for multi-dimensional skipping.

Directory partitioning (bucketing.py) prunes on ONE low-cardinality column;
range-sorting the files prunes on ONE ordered column. A query that filters
two continuous dimensions at once (``WHERE x BETWEEN ... AND y BETWEEN ...``
— the histogram_2d / pixel-box access pattern) gets no help from either: a
layout sorted by x scatters every y range across all files. The standard
warehouse answer is Z-ORDER clustering: map each row to the interleaved-bit
Morton code of its (quantized) dimensions and range-partition the write on
that code. Rows close in (x, y) land in the same files, so every file's
parquet footer min/max covers a small RECTANGLE of the (x, y) plane and a
box predicate overlaps only O(perimeter) files instead of all of them.
Engines read the same files back with plain predicate pushdown — the layout
is invisible to queries, it only makes row-group/file statistics selective.

Everything here is JVM-side integer expression math (shift/mask Morton
spreading — no UDFs); the quantization bounds come from one tiny min/max
agg, the same planning-time scalar pull as the reference's two-pass bin
scheme (main.py:54 min/max before binning).

At 100 TB: ``repartitionByRange(z)`` samples the z distribution and gives
each output task an equal z-slice — balanced files regardless of data skew,
one full shuffle at write time, amortized over every later box query (the
identical trade bucketing makes for equi-joins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Morton spreading constants: 16-bit value -> its bits in the even
# positions of a 32-bit word ("magic numbers" bit twiddling, public domain).
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(c: Column) -> Column:
    for shift, mask in _SPREAD:
        c = (c.bitwiseOR(F.shiftleft(c, shift))).bitwiseAND(F.lit(mask))
    return c


def quantize16(c: Column, lo: float, hi: float) -> Column:
    """Scale [lo, hi] to the 16-bit grid (clamped; degenerate range -> 0)."""
    if hi <= lo:
        return F.lit(0).cast("bigint")
    scaled = (c.cast("double") - F.lit(lo)) / F.lit(hi - lo) * 65535.0
    return F.least(
        F.lit(65535), F.greatest(F.lit(0), scaled.cast("bigint"))
    )


def morton2(x: Column, y: Column) -> Column:
    """Interleave two 16-bit quantized columns into the 32-bit Z-code."""
    return _spread16(x).bitwiseOR(F.shiftleft(_spread16(y), 1))


def zorder_code(
    df: DataFrame, x_col: str, y_col: str, bounds: tuple[float, float, float, float]
) -> Column:
    xlo, xhi, ylo, yhi = bounds
    return morton2(
        quantize16(F.col(x_col), xlo, xhi), quantize16(F.col(y_col), ylo, yhi)
    )


def column_bounds(
    df: DataFrame, x_col: str, y_col: str
) -> tuple[float, float, float, float]:
    """One tiny agg -> (xlo, xhi, ylo, yhi) quantization bounds (4 scalars
    to the driver — planning-time, same as the reference's min/max pass)."""
    r = df.agg(
        F.min(x_col), F.max(x_col), F.min(y_col), F.max(y_col)
    ).first()
    return (float(r[0]), float(r[1]), float(r[2]), float(r[3]))


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    num_files: int = 16,
    bounds: tuple[float, float, float, float] | None = None,
) -> tuple[float, float, float, float]:
    """Write ``df`` as parquet clustered on the Z-code of (x, y).

    ``repartitionByRange`` on the code yields one contiguous z-slice per
    file; the code column itself is dropped before writing (derivable, and
    keeping the files schema-identical to the input). Returns the bounds
    used (persist them next to the table to z-order later appends onto the
    same grid — appends quantized under different bounds would interleave
    incompatibly).
    """
    b = bounds or column_bounds(df, x_col, y_col)
    z = zorder_code(df, x_col, y_col, b).alias("__z")
    (
        df.select("*", z)
        .repartitionByRange(num_files, F.col("__z"))
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return b
