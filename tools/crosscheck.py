#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare (dev tool only).

Usage: python3 tools/crosscheck.py <sfDir> <verifyOutDir>
For each query dir in verifyOutDir: read the Spark parquet dump, run the
oracle SQL from oracle_sql.json in DuckDB (tables = parquet files in sfDir),
sort columns by name and rows by all columns, and compare exactly plus
allclose for floats. Prints a per-query verdict.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0
for q in sorted(oracle):
    qdir = os.path.join(outdir, q)
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in
                              sorted(glob.glob(os.path.join(qdir, "*.parquet")))],
                             ignore_index=True)
        duck_df = con.execute(oracle[q]).df()
    except Exception as e:
        print(f"FAIL {q}: exec error: {e}")
        fails += 1
        continue
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {q}: columns spark={list(s.columns)} duck={list(d.columns)}")
        fails += 1
        continue
    if len(s) != len(d):
        print(f"FAIL {q}: rows spark={len(s)} duck={len(d)}")
        fails += 1
        continue
    bad = []
    for c in s.columns:
        a, b = s[c], d[c]
        # Dtype divergence check (VERDICT r3 item 2): the driver's hasher is
        # TYPED — DuckDB HUGEINT (e.g. sum over BIGINT) reaches pandas as
        # float64 while Spark dumps int64, so equal VALUES still hash-differ.
        # Coercing both sides to float here would mask exactly that, so a
        # cross-kind dtype mismatch (int vs float vs object ...) is a HARD
        # failure; same-kind width/resolution differences are warned loudly.
        if a.dtype != b.dtype:
            if a.dtype.kind != b.dtype.kind:
                bad.append((c, f"DTYPE: spark={a.dtype} duck={b.dtype} "
                               "(driver hash is typed — CAST the oracle column)"))
                continue
            print(f"WARN {q}.{c}: dtype width differs spark={a.dtype} duck={b.dtype}")
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            a = a.astype(float); b = b.astype(float)
            ok = ((a.isna() & b.isna()) |
                  np.isclose(a.fillna(0), b.fillna(0), rtol=1e-9, atol=1e-9) &
                  (a.isna() == b.isna())).all()
            exact = (a.fillna(-1.5e308) == b.fillna(-1.5e308)).all()
            if not ok:
                bad.append((c, "allclose-fail"))
            elif not exact:
                bad.append((c, "close-but-not-exact"))
        else:
            sa = a.astype(str).fillna("\0")
            sb = b.astype(str).fillna("\0")
            if not (sa == sb).all():
                i = (sa != sb).idxmax()
                bad.append((c, f"mismatch@{i}: {a[i]!r} vs {b[i]!r} (dtypes {a.dtype}/{b.dtype})"))
    hard = [x for x in bad if x[1] != "close-but-not-exact"]
    soft = [x for x in bad if x[1] == "close-but-not-exact"]
    if hard:
        print(f"FAIL {q}: {hard}")
        fails += 1
    elif soft:
        print(f"SOFT {q}: not bit-exact (ok if driver uses allclose): {[c for c,_ in soft]}")
    else:
        print(f"OK   {q} ({len(s)} rows)")
print(f"\n{fails} hard failures")
sys.exit(1 if fails else 0)
