"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf directory, then compares row count, column names,
and values (rows sorted by all columns; exact for ints/strings, tight
tolerance report for floats). Usage:

    python tools/check_oracle.py [--layouts] [sf_dir] [name ...]

``--layouts`` additionally re-runs each Spark query under forced input
partition layouts (repartition 1/7/64 via the SPARK_GRAFT_LAYOUT_PARTS
hook in sources/tables.py) and requires EXACT value equality across all
layouts. This is the rotation-gate pre-screen (VERDICT r14 #2): a query
that is oracle-green under one layout but whose float rounding depends on
partial-summation order (the embedding_covariance r14 failure class) is
rejected HERE instead of going red at the driver.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from compute_histogram_spark.session import get_session, release_persists
from compute_histogram_spark.sources.tables import TABLES
import __spark_entry__ as entrymod


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        return [f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"]
    if len(sdf) != len(odf):
        problems.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
        return problems
    s, o = normalize(sdf), normalize(odf)
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        if np.issubdtype(sv.dtype, np.floating):
            both_nan = pd.isna(sv) & pd.isna(ov)
            # The driver's value-hash distinguishes -0.0 from +0.0 (IEEE
            # `==` does not), so mirror it: equal values must also agree
            # on the sign bit. VERDICT r15 #1 — embedding_covariance was
            # local-green/driver-red for two rounds on exactly this.
            with np.errstate(invalid="ignore"):
                eq = ((sv == ov) & (np.signbit(sv) == np.signbit(ov))) | both_nan
            if not eq.all():
                bad = (~eq).sum()
                with np.errstate(invalid="ignore"):
                    mx = np.nanmax(np.abs(sv - ov))
                problems.append(f"col {c}: {bad}/{len(sv)} values differ, max abs diff {mx:.3e}")
        else:
            eq = sv == ov
            if not eq.all():
                i = int(np.argmax(~eq))
                problems.append(
                    f"col {c}: {(~eq).sum()}/{len(sv)} values differ, first at row {i}: "
                    f"spark={sv[i]!r} oracle={ov[i]!r}"
                )
    return problems


LAYOUT_PARTS = (1, 7, 64)


def layout_screen(name: str, fn, spark, sf_dir: str, base: pd.DataFrame) -> list[str]:
    """Re-run ``fn`` under each forced input layout and demand exact value
    equality with the default-layout result. Returns problem strings."""
    problems = []
    for parts in LAYOUT_PARTS:
        os.environ["SPARK_GRAFT_LAYOUT_PARTS"] = str(parts)
        try:
            adf = fn(spark, sf_dir)
            alt = adf.toPandas()
            release_persists(adf)
        except Exception as e:  # noqa: BLE001 — report, don't crash the sweep
            problems.append(f"layout {parts}: spark error: {type(e).__name__}: {e}")
            continue
        finally:
            os.environ.pop("SPARK_GRAFT_LAYOUT_PARTS", None)
        diff = compare(name, alt, base)
        for p in diff:
            problems.append(f"layout {parts}: {p}")
    return problems


def main() -> int:
    argv = sys.argv[1:]
    layouts = "--layouts" in argv
    argv = [a for a in argv if a != "--layouts"]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    # mirror the DRIVER's session, not the engine's tuned one: ANSI ON is
    # the default in Spark 4 and is what the real gate runs with — any
    # wrapping/overflowing cast must fail HERE, not at the driver.
    spark = get_session("check_oracle", extra_conf={"spark.sql.ansi.enabled": "true"})
    con = duck_connection(sf_dir)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failed = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            qdf = fn(spark, sf_dir)
            sdf = qdf.toPandas()
            release_persists(qdf)  # free tagged per-run persists (r17)
        except Exception as e:
            failed.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"skip  {name}: no oracle (rows-only: {len(sdf)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failed.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        problems = compare(name, sdf, odf)
        if layouts and not problems:
            problems = layout_screen(name, fn, spark, sf_dir, sdf)
        if problems:
            failed.append(name)
            print(f"FAIL  {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"ok    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
