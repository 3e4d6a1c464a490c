"""CLI facade — Spark-first twin of the reference's click driver
(``cli``, main.py:17-57).

Differences from the reference, all deliberate:

- SOURCE is a parquet path (or a GeoJSON tile catalog via ``--catalog``,
  S1) instead of an S3 GeoJSON+rasters pair — the engine's data model is
  columnar tables (SURVEY §1.4).
- ``--minmax_only`` actually works: the reference declares the flag but
  ignores it (main.py:27-33 vs 42-57, SURVEY §4 quirk 5). Here it stops
  after pass 1 and prints the bounds.
- ``--min_value/--max_value`` prune pass 1 exactly like the reference
  (main.py:53-54): one Spark job instead of two.
- ``--ref-compat`` opts into the reference's numeric quirks (zero-seeded
  min/max, hardcoded log offset 100, int16 bin keys — SURVEY §4 1-3);
  default is the sane mode the oracles check.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="compute-histogram-spark",
        description="Distributed histogram + deciles over a parquet column.",
    )
    p.add_argument("source", help="parquet file/dir with the value column")
    p.add_argument("--column", "-c", default="value", help="value column name")
    p.add_argument(
        "--method", "-m", choices=("linear", "log"), default="linear"
    )
    p.add_argument("--min_value", type=float, default=None)
    p.add_argument("--max_value", type=float, default=None)
    p.add_argument(
        "--minmax_only",
        action="store_true",
        help="stop after the min/max pass and print bounds",
    )
    p.add_argument("--ref-compat", action="store_true")
    p.add_argument("--sparse", action="store_true", help="occupied bins only")
    p.add_argument("--deciles", action="store_true", help="also print deciles")
    p.add_argument("--output", "-o", default=None, help="histogram.csv dir")
    p.add_argument("--workers", "-w", type=int, default=None, help="local cores")
    return p


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    args = build_parser().parse_args(argv)

    from compute_histogram_spark.operators import deciles as D
    from compute_histogram_spark.operators import histogram as H
    from compute_histogram_spark.session import get_session
    from compute_histogram_spark.sources.sinks import write_histogram_csv

    own_session = spark is None
    if own_session:
        master = f"local[{args.workers}]" if args.workers else "local[*]"
        spark = get_session("compute-histogram-spark", master=master)

    try:
        # TIMESTAMP(NANOS) columns (e.g. the driver's events table) are
        # unreadable by the vectorized reader without this; epoch-nanos
        # BIGINT is the documented engine representation (sources/tables.py).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(args.source)

        if args.minmax_only:
            mn, mx = H.compute_min_max(df, args.column, ref_compat=args.ref_compat)
            print(f"min={mn} max={mx}")
            return 0

        histo = H.histogram(
            df,
            args.column,
            args.method,
            min_value=args.min_value,
            max_value=args.max_value,
            ref_compat=args.ref_compat,
            dense=not args.sparse,
        )
        if args.output:
            write_histogram_csv(histo, args.output)
            print(f"wrote {args.output}")
        else:
            for r in histo.collect():
                print("%1.2f, %d" % (r["value"], r["pixel_count"]))
        if args.deciles:
            for r in D.deciles(histo).collect():
                print(
                    f"p{r['percentile']}: [{r['min_value']}, {r['max_value']}] "
                    f"n={r['bucket_count']}"
                )
        return 0
    finally:
        if own_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
