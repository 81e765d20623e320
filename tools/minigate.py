#!/usr/bin/env python3
"""Mini correctness gate: run Verify for a subset, compare vs DuckDB.
Usage: minigate.py <sfdir> <outdir>  (Verify must already have dumped outdir)"""
import duckdb, json, sys, glob, os
sfdir, outdir = sys.argv[1], sys.argv[2]
sqls = json.load(open(f'{outdir}/oracle_sql.json'))
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    p = f'{sfdir}/{t}.parquet'
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
fails = 0
for name in sorted(os.listdir(outdir)):
    d = f'{outdir}/{name}'
    if not os.path.isdir(d): continue
    sp = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')").fetchdf()
    if name not in sqls:
        print(f"{name}: rows={len(sp)} (no oracle)"); continue
    oc = con.execute(sqls[name]).fetchdf()
    sp2 = sp[sorted(sp.columns)].sort_values(by=sorted(sp.columns)).reset_index(drop=True)
    oc.columns = [c for c in oc.columns]
    oc2 = oc[sorted(oc.columns)].sort_values(by=sorted(oc.columns)).reset_index(drop=True)
    ok_schema = sorted(sp.columns) == sorted(oc.columns)
    ok_rows = len(sp2) == len(oc2)
    ok_vals = ok_schema and ok_rows
    if ok_vals:
        import pandas as pd
        for c in sorted(sp.columns):
            a, b = sp2[c], oc2[c]
            try:
                import numpy as np
                if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
                    if not np.allclose(a.astype(float), b.astype(float), rtol=0, atol=1e-9, equal_nan=True):
                        ok_vals = False
                elif not a.astype(str).equals(b.astype(str)):
                    ok_vals = False
            except Exception as e:
                ok_vals = False
    status = "OK" if (ok_schema and ok_rows and ok_vals) else f"FAIL schema={ok_schema} rows={ok_rows}({len(sp2)}/{len(oc2)}) vals={ok_vals}"
    if not (ok_schema and ok_rows and ok_vals): fails += 1
    print(f"{name}: {status}")
sys.exit(1 if fails else 0)
