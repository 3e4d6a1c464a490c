"""Z-order layout: Morton-code correctness and the file-skipping payoff,
measured from real parquet footer statistics (the same min/max stats any
engine's scan uses for row-group pruning)."""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from compute_histogram_spark.sources import zorder as Z
from compute_histogram_spark.sources.tables import load


def test_morton_code_golden(spark):
    """Bit interleaving matches the hand-computed Morton codes."""
    df = spark.range(1).select(
        Z.morton2(F.lit(0).cast("bigint"), F.lit(0).cast("bigint")).alias("a"),
        Z.morton2(F.lit(1).cast("bigint"), F.lit(0).cast("bigint")).alias("b"),
        Z.morton2(F.lit(0).cast("bigint"), F.lit(1).cast("bigint")).alias("c"),
        Z.morton2(F.lit(3).cast("bigint"), F.lit(5).cast("bigint")).alias("d"),
        Z.morton2(
            F.lit(65535).cast("bigint"), F.lit(65535).cast("bigint")
        ).alias("e"),
    )
    r = df.first()
    # interleave(x=0b011, y=0b101) = y2 x2 y1 x1 y0 x0 = 0b100111 = 39
    assert (r["a"], r["b"], r["c"], r["d"]) == (0, 1, 2, 39)
    assert r["e"] == (1 << 32) - 1


def _file_ranges(path: str, cols: tuple[str, str]):
    """Per-file (min, max) of each col from parquet footers."""
    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins = {c: None for c in cols}
        maxs = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for i in range(row_group.num_columns):
                col = row_group.column(i)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    st = col.statistics
                    mins[name] = (
                        st.min if mins[name] is None else min(mins[name], st.min)
                    )
                    maxs[name] = (
                        st.max if maxs[name] is None else max(maxs[name], st.max)
                    )
        if all(v is not None for v in mins.values()):
            out.append({c: (mins[c], maxs[c]) for c in cols})
    return out


def _overlaps(ranges, col, lo, hi):
    return sum(1 for r in ranges if r[col][0] <= hi and r[col][1] >= lo)


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("zorder"))
    ev = load(spark, sf_dir, "events").select("user_id", "value", "event_id")
    ev = ev.where(F.col("value").isNotNull() & ~F.isnan("value"))
    zpath, xpath = os.path.join(base, "z"), os.path.join(base, "x")
    bounds = Z.write_zordered(ev, zpath, "user_id", "value", num_files=64)
    # comparison layout: range-sorted by user_id only (the 1-D best case)
    ev.repartitionByRange(64, "user_id").write.mode("overwrite").parquet(xpath)
    return ev, zpath, xpath, bounds


def test_zorder_roundtrip_lossless(spark, layouts):
    ev, zpath, _, _ = layouts
    back = spark.read.parquet(zpath)
    assert back.count() == ev.count()
    # box query returns the exact same rows as filtering the source
    ulo, uhi = ev.agg(F.min("user_id"), F.max("user_id")).first()
    pred = (
        (F.col("user_id") >= ulo) & (F.col("user_id") <= (ulo + uhi) / 2)
        & (F.col("value") >= 10) & (F.col("value") <= 30)
    )
    got = sorted(r["event_id"] for r in back.where(pred).collect())
    want = sorted(r["event_id"] for r in ev.where(pred).collect())
    assert got == want and len(got) > 0


def test_zorder_skips_files_on_second_dimension(spark, layouts):
    """The payoff: a value-range predicate overlaps a small fraction of
    z-ordered files, but EVERY user_id-sorted file (value is uniform within
    each x-slice). Footer stats are what engines prune with, so the
    overlap count is the number of files a scan must read."""
    ev, zpath, xpath, _ = layouts
    zr = _file_ranges(zpath, ("user_id", "value"))
    xr = _file_ranges(xpath, ("user_id", "value"))
    # z codes are high-cardinality -> full 64-way split; the user_id sort
    # caps at the distinct-key count (range partitioning can't split a key)
    assert len(zr) > 32 and len(xr) >= 10

    # middle ~10% slice of the value range
    vlo, vhi = ev.agg(F.min("value"), F.max("value")).first()
    lo = vlo + 0.45 * (vhi - vlo)
    hi = vlo + 0.55 * (vhi - vlo)

    z_hit = _overlaps(zr, "value", lo, hi)
    x_hit = _overlaps(xr, "value", lo, hi)
    assert x_hit == len(xr)          # 1-D layout: no pruning on dim 2
    assert z_hit <= len(zr) // 2     # z-order: most files skipped
