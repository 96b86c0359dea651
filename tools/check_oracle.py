#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, load the Spark result parquet, sort columns by
name and rows by all columns, and compare exactly.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Dev-only tool (duckdb/pandas are driver-side deps, not used by the engine).
"""
import json
import sys
import glob
import time

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str, only: list = ()) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:  # optional query-name filter for fast dev iteration
        oracle = {k: v for k, v in oracle.items() if k in set(only)}
    dumped = {p.split("/")[-1] for p in glob.glob(f"{out_dir}/*") if "." not in p.split("/")[-1]}
    rows_only = sorted(dumped - set(oracle))
    if rows_only:
        print(f"rows-only (no oracle SQL, driver checks rows>0): {', '.join(rows_only)}")
    n_pass = n_fail = 0
    show_time = bool(int(__import__('os').environ.get('CHECK_ORACLE_TIME', '0')))
    for name in sorted(oracle):
        sql = oracle[name]
        t0 = time.time()
        try:
            odf = con.execute(sql).fetchdf()
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output")
                n_fail += 1
                continue
            sdf = pd.concat([pd.read_parquet(f) for f in files])
            a, b = canon(sdf), canon(odf)
            if list(a.columns) != list(b.columns):
                print(f"FAIL {name}: columns spark={list(a.columns)} oracle={list(b.columns)}")
                n_fail += 1
                continue
            if len(a) != len(b):
                print(f"FAIL {name}: rows spark={len(a)} oracle={len(b)}")
                n_fail += 1
                continue
            # value-exact compare, plus a dtype gate mirroring the driver's
            # hash-level check: int64 3 vs float64 3.0 hashes differently
            # upstream, so an integer/float family mismatch is a FAIL here.
            diffs = []
            for c in a.columns:
                av, bv = a[c], b[c]
                a_int = pd.api.types.is_integer_dtype(av)
                b_int = pd.api.types.is_integer_dtype(bv)
                a_flt = pd.api.types.is_float_dtype(av)
                b_flt = pd.api.types.is_float_dtype(bv)
                if (a_int and b_flt) or (a_flt and b_int):
                    diffs.append((c, f"dtype family mismatch spark={av.dtype} "
                                     f"oracle={bv.dtype} (driver hash would differ)"))
                    continue
                try:
                    eq = (av.astype(object).where(pd.notna(av), None) ==
                          bv.astype(object).where(pd.notna(bv), None)) | (
                        pd.isna(av) & pd.isna(bv))
                except Exception as e:  # noqa: BLE001
                    diffs.append((c, f"compare error: {e}"))
                    continue
                if not bool(eq.all()):
                    i = int((~eq).idxmax())
                    diffs.append((c, f"row {i}: spark={av.iloc[i]!r} oracle={bv.iloc[i]!r} "
                                     f"dtypes {av.dtype}/{bv.dtype}"))
            if diffs:
                print(f"FAIL {name}: " + "; ".join(f"{c} {m}" for c, m in diffs[:3]))
                n_fail += 1
            else:
                suffix = f" [{time.time() - t0:.1f}s]" if show_time else ""
                print(f"PASS {name} ({len(a)} rows){suffix}")
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
