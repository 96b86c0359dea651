#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tooling only — the
shipped engine is pure Scala/Spark; this script just pre-verifies oracles
the same way the driver does: run Verify's parquet dumps against DuckDB).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); n_fail += 1; continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        bad = None
        for c in g.columns:
            gv, ev = g[c], e[c]
            if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
                ga = gv.astype(float).to_numpy()
                ea = ev.astype(float).to_numpy()
                neq = [(i, x, y) for i, (x, y) in enumerate(zip(ga, ea))
                       if not (x == y or (math.isnan(x) and math.isnan(y)))]
                if neq:
                    i, x, y = neq[0]
                    bad = f"col {c} row {i}: {x!r} != {y!r} (diff {abs(x-y):g}; {len(neq)} rows differ)"
                    break
            else:
                if not gv.astype(str).equals(ev.astype(str)):
                    i = (gv.astype(str) != ev.astype(str)).idxmax()
                    bad = f"col {c} row {i}: {gv[i]!r} != {ev[i]!r}"
                    break
        if bad:
            print(f"FAIL {name}: {bad}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows, {len(g.columns)} cols)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
