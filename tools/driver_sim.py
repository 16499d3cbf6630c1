"""Simulate the driver's CORRECTNESS loop with per-query wall timing.

Runs every ``queries()`` entry at sf0.01 in registration order (the order the
driver sees), compares against ``oracle_sql()`` via DuckDB, canonicalizes both
sides like the driver (sort columns by name, pandas sort_values over raw
cells — the exact step that crashes on array cells), and prints a timing
table. Use this to (a) catch canonicalizer-hostile output types before the
driver does and (b) keep total pass time far below any plausible driver
budget.

Usage: python tools/driver_sim.py [--sf-dir DIR] [--limit N] [--names a,b,c]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonicalization: sort columns by name, then row-sort by
    every column over raw cell values (this is where list cells explode)."""
    cols = sorted(df.columns)
    df = df[cols]
    if len(df):
        df = df.sort_values(by=cols).reset_index(drop=True)
    return df


def cell_hash(df: pd.DataFrame) -> int:
    return hash(tuple(tuple(str(v) for v in row) for row in df.itertuples(index=False)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--names", default="")
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from pythonmapreduce_spark.catalog import TABLES
    from pythonmapreduce_spark.session import get_spark

    t0 = time.time()
    spark = get_spark("driver-sim")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    print(f"session+registry up in {time.time() - t0:.2f}s; {len(qs)} queries", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    names = list(qs)
    if args.names:
        names = [n for n in names if n in set(args.names.split(","))]
    if args.limit:
        names = names[: args.limit]

    results: dict[str, dict] = {}
    total0 = time.time()
    for i, name in enumerate(names):
        t0 = time.time()
        status = "ok"
        err = None
        spark_rows = oracle_rows = None
        try:
            sdf = qs[name](spark, args.sf_dir)
            got = canon(sdf.toPandas())
            spark_rows = len(got)
            t_spark = time.time() - t0
            if name in oracles:
                want = canon(con.sql(oracles[name]).df())
                oracle_rows = len(want)
                if sorted(got.columns) != sorted(want.columns):
                    status = "SCHEMA_MISMATCH"
                    err = f"spark={sorted(got.columns)} oracle={sorted(want.columns)}"
                elif spark_rows != oracle_rows:
                    status = "ROWS_MISMATCH"
                else:
                    a = sorted(tuple(str(v) for v in r) for r in got.itertuples(index=False))
                    b = sorted(tuple(str(v) for v in r) for r in want.itertuples(index=False))
                    # Strict raw-stringify compare — the WORST CASE for an
                    # unknown external canonicalizer (catches int64-vs-float
                    # dtype drift that a rounding/normalizing compare hides;
                    # tests/test_oracle_diff.py does the tolerant compare).
                    if a != b:
                        ndiff = sum(1 for x, y in zip(a, b) if x != y)
                        status = "VALUES_DRIFT"
                        first = next((x, y) for x, y in zip(a, b) if x != y)
                        err = f"{ndiff}/{len(a)} rows differ under str(); first: {first}"
            else:
                status = "rows_only"
        except Exception as e:  # noqa: BLE001
            status = "ERROR"
            err = f"{type(e).__name__}: {e}"
            t_spark = time.time() - t0
        dt_total = time.time() - t0
        results[name] = {
            "i": i,
            "status": status,
            "sec": round(dt_total, 3),
            "spark_rows": spark_rows,
            "oracle_rows": oracle_rows,
            "err": (err or "")[:300] or None,
        }
        print(f"{i:3d} {name:28s} {status:15s} {dt_total:6.2f}s", flush=True)

    total = time.time() - total0
    bad = {k: v for k, v in results.items() if v["status"] not in ("ok", "rows_only")}
    print(f"\nTOTAL {total:.1f}s for {len(names)} queries "
          f"(avg {total / max(1, len(names)):.2f}s); problems: {len(bad)}")
    for k, v in bad.items():
        print(f"  {k}: {v['status']} {v['err']}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"total_sec": total, "results": results}, f, indent=1)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
