#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness compare.

Usage: check.py <sfDir> <verifyOutDir> [query ...]
Compares each <outDir>/<name> parquet against the oracle SQL in
<outDir>/oracle_sql.json run by DuckDB over <sfDir>'s tables:
sorted column names, fully sorted rows, exact values.
"""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only: continue
        sql = oracle[name]
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        g, e = got[sorted(got.columns)], exp[sorted(exp.columns)]
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1; continue
        g = g.sort_values(by=list(g.columns), kind="mergesort").reset_index(drop=True)
        e = e.sort_values(by=list(e.columns), kind="mergesort").reset_index(drop=True)
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        bad = []
        for c in g.columns:
            gv, ev = g[c].to_numpy(), e[c].to_numpy()
            try:
                eq = (pd.isna(g[c]) & pd.isna(e[c])) | (gv == ev)
                ok = bool(np.all(eq))
            except Exception:
                ok = list(gv) == list(ev)
            if not ok:
                idx = int(np.argmin(eq)) if hasattr(eq, "__len__") else 0
                bad.append((c, str(g[c].dtype), str(e[c].dtype), gv[idx], ev[idx]))
        if bad:
            print(f"FAIL {name}: value mismatch {bad[:3]}")
            n_fail += 1
        else:
            dt_warn = [(c, str(g[c].dtype), str(e[c].dtype)) for c in g.columns
                       if str(g[c].dtype) != str(e[c].dtype)]
            suffix = f"  (dtype diff: {dt_warn})" if dt_warn else ""
            print(f"OK   {name} ({len(g)} rows){suffix}")
            n_ok += 1
    print(f"== {n_ok} ok, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
