"""Bin-scheme planning: the histogram's tiny logical plan.

The reference derives the binning entirely on the driver from the global
min/max (``get_range``, main.py:152-179) and then broadcasts the scheme to
workers (main.py:94-96). We keep that split: ``BinScheme`` is pure
driver-side scalar math (so the subtle ``int()``-truncation semantics stay in
Python, exactly as in the reference), and :meth:`bin_key_expr` /
:meth:`label_expr` produce the Column expressions Catalyst folds into the
scan->project->aggregate pipeline. At cluster scale the scheme is a handful
of plan-time literals — there is nothing to ship but the expression itself.

Reference semantics encoded here (SURVEY §2.2 A3-A6, §4 quirks):

- linear: ``lo = int(min*100)-10; hi = int(max*100)+10`` (main.py:161-165);
  key = ``int(value*100)`` (main.py:195); label = ``bin/100`` (main.py:111).
- log: ``offset = abs(min)+1 if min <= 0 else 0`` (main.py:167-168);
  ``lo = int(log(min+offset)*1000)``, ``hi = int(log(max+offset)*1000)``
  (main.py:169-172); label = ``exp(bin/1000)-offset`` (main.py:113-115).
- ``int()`` truncates toward zero (not floor) — matched with
  ``math.trunc`` here and ``CAST(double AS BIGINT)`` (non-ANSI) on columns.
- quirk (ref_compat only): the *forward* log transform hardcodes offset 100
  (``np.log(w+100)*1000``, main.py:197) even when the planned offset
  differs; and bin keys are cast to int16, wrapping beyond +-32767
  (main.py:195,197). Default mode uses the computed offset and 64-bit keys.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column
import pyspark.sql.functions as F

LINEAR = "linear"
LOG = "log"


@dataclass(frozen=True)
class BinScheme:
    """A fully-determined binning: unit-width integer bins over [lo, hi)."""

    method: str
    lo: int
    hi: int
    offset: float = 0.0
    ref_compat: bool = False

    @property
    def bins(self) -> int:
        # len(range(lo, hi)) — main.py:176
        return max(self.hi - self.lo, 0)

    @staticmethod
    def from_min_max(
        min_value: float,
        max_value: float,
        method: str = LINEAR,
        ref_compat: bool = False,
    ) -> "BinScheme":
        """Driver-side scalar planning — mirrors ``get_range`` (main.py:152-179)."""
        if method == LINEAR:
            lo = math.trunc(min_value * 100) - 10
            hi = math.trunc(max_value * 100) + 10
            offset = 0.0
        elif method == LOG:
            offset = abs(min_value) + 1 if min_value <= 0 else 0.0
            lo = math.trunc(math.log(min_value + offset) * 1000)
            hi = math.trunc(math.log(max_value + offset) * 1000)
        else:
            raise ValueError(f"Unknown method {method}")
        return BinScheme(method=method, lo=lo, hi=hi, offset=offset, ref_compat=ref_compat)

    # -- column expressions -------------------------------------------------

    def _key_type(self) -> str:
        # int16 wrap is a reference quirk (main.py:195,197); 64-bit is sane.
        return "smallint" if self.ref_compat else "bigint"

    def bin_key_expr(self, col: Column) -> Column:
        """value -> integer bin key (main.py:194-197).

        Casting double->integral truncates toward zero in Spark (non-ANSI),
        matching ``ndarray.astype(np.int16)``.
        """
        if self.method == LINEAR:
            return (col * F.lit(100)).cast(self._key_type())
        # ref bug: forward transform always uses +100 (main.py:197)
        fwd_offset = 100.0 if self.ref_compat else self.offset
        return (F.log(col + F.lit(fwd_offset)) * F.lit(1000)).cast(self._key_type())

    def clamp_expr(self, bin_col: Column) -> Column:
        """np.histogram edge rule: last bin is closed, so key == hi lands in
        bin hi-1; keys outside [lo, hi] were dropped by :meth:`range_filter`
        (SURVEY §2.2 A7)."""
        return F.least(bin_col, F.lit(self.hi - 1))

    def range_filter(self, bin_col: Column) -> Column:
        return (bin_col >= F.lit(self.lo)) & (bin_col <= F.lit(self.hi))

    def label_expr(self, bin_col: Column) -> Column:
        """bin key -> left-edge label in value space (main.py:110-118)."""
        if self.method == LINEAR:
            return bin_col / F.lit(100.0)
        return F.exp(bin_col / F.lit(1000.0)) - F.lit(self.offset)
