"""CLI facade (A12): minmax_only actually stops after pass 1 (unlike the
reference's dead flag, main.py:27-33), bounds pruning, csv output."""

import glob
import os

from compute_histogram_spark.cli import main


def _events(sf_dir):
    return os.path.join(sf_dir, "events.parquet")


def test_minmax_only(spark, sf_dir, capsys):
    rc = main([_events(sf_dir), "--minmax_only"], spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith("min=") and "max=" in out


def test_histogram_csv_output(spark, sf_dir, tmp_path):
    out_dir = str(tmp_path / "h")
    rc = main([_events(sf_dir), "-o", out_dir], spark=spark)
    assert rc == 0
    parts = glob.glob(os.path.join(out_dir, "part-*"))
    assert parts and open(parts[0]).readline().count(",") == 1


def test_bounds_prune_and_deciles(spark, sf_dir, capsys):
    rc = main(
        [_events(sf_dir), "--min_value", "0", "--max_value", "500",
         "--sparse", "--deciles"],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "p100" in out or "p90" in out
