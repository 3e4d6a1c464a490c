"""Vector-column expressions (ARRAY<FLOAT|DOUBLE>) — all JVM-side.

``F.zip_with`` / ``F.aggregate`` run inside Catalyst (no Python round-trip),
folding over array elements *in index order* — which also makes the double
summation order deterministic, unlike a shuffled groupBy-sum. Inputs are cast
to double BEFORE arithmetic so float32 storage doesn't poison accumulation.

At 100 TB / high dimension, a Pandas-UDF BLAS path (matrix block x block)
beats per-row folds; see operators/similarity.py for where that swap lands.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def to_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine from precomputed norms (norms are computed once per vector,
    not once per pair — crucial when pairing blows up row counts)."""
    return dot(a, b) / (norm_a * norm_b)
