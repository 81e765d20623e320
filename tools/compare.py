#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Loads every testdata table as a DuckDB view, runs each oracle_sql.json
query, reads the corresponding Spark parquet output, and compares after
sorting columns by name and rows by all columns. Exact equality required
(floats included) — matches the driver's hash-compare discipline.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(r) for r in df.itertuples(index=False, name=None)]
    def key(row):
        return tuple((x is None or (isinstance(x, float) and math.isnan(x)),
                      str(type(x)), str(x)) for x in row)
    rows.sort(key=key)
    return cols, rows

def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    # int-vs-float / Decimal looseness is a FAILURE for the driver; flag it
    return type(a) == type(b) and a == b

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            continue
        got = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        gc, gr = canon(got)
        ec, er = canon(exp)
        if gc != ec:
            print(f"FAIL {name}: columns spark={gc} oracle={ec}")
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows spark={len(gr)} oracle={len(er)}")
            continue
        bad = None
        for i, (a, b) in enumerate(zip(gr, er)):
            for j, (x, y) in enumerate(zip(a, b)):
                if not cell_eq(x, y):
                    bad = (i, gc[j], x, y)
                    break
            if bad:
                break
        if bad:
            i, c, x, y = bad
            print(f"FAIL {name}: row {i} col {c}: spark={x!r} ({type(x).__name__}) oracle={y!r} ({type(y).__name__})")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(gr)} rows)")
    print(f"== {n_pass}/{len(oracle)} passed ==")

if __name__ == "__main__":
    main()
