#!/usr/bin/env python3
"""Local pre-check that mimics the driver's correctness gate:
read each <out>/<name> parquet written by graft.Verify, run the matching
oracle SQL from oracle_sql.json in DuckDB over the same sf dir, and
compare (schema-sorted columns, row-sorted, value-compare with small
float tolerance plus exact hash like the driver likely does).

Usage: python3 scripts/check_oracle.py <outDir> <sfDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

fail = 0
for name in sorted(oracle):
    res_dir = os.path.join(out_dir, name)
    files = glob.glob(os.path.join(res_dir, "*.parquet"))
    if not files:
        print(f"[MISS] {name}: no spark output")
        fail += 1
        continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"[ORACLE-ERR] {name}: {e}")
        fail += 1
        continue
    g = got.reindex(sorted(got.columns), axis=1)
    e = exp.reindex(sorted(exp.columns), axis=1)
    if list(g.columns) != list(e.columns):
        print(f"[SCHEMA] {name}: spark={list(g.columns)} oracle={list(e.columns)}")
        fail += 1
        continue
    if len(g) != len(e):
        print(f"[ROWS] {name}: spark={len(g)} oracle={len(e)}")
        fail += 1
        continue
    gs = g.sort_values(by=list(g.columns)).reset_index(drop=True)
    es = e.sort_values(by=list(e.columns)).reset_index(drop=True)
    # exact-compare after canonicalizing to strings (what a hash compare sees)
    mismatched_cols = []
    for c in g.columns:
        a, b = gs[c], es[c]
        try:
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                ok = ((a.isna() & b.isna()) | ((a - b).abs() < 1e-9)).all()
                exact = (a.astype(str) == b.astype(str)).all()
                if ok and not exact:
                    mismatched_cols.append((c, "float-close-but-not-exact"))
                elif not ok:
                    mismatched_cols.append((c, "float-differs"))
            else:
                if not (a.astype(str) == b.astype(str)).all():
                    mismatched_cols.append((c, "differs"))
        except Exception as ex:
            mismatched_cols.append((c, f"cmp-error {ex}"))
    if mismatched_cols:
        print(f"[VALUES] {name}: {mismatched_cols}")
        for c, _ in mismatched_cols[:2]:
            d = gs[gs[c].astype(str) != es[c].astype(str)]
            print("  spark:", gs.loc[d.index[:3], c].tolist() if len(d) else "?",
                  " oracle:", es.loc[d.index[:3], c].tolist() if len(d) else "?")
        fail += 1
    else:
        print(f"[OK] {name} ({len(g)} rows)")

rows_only = [d for d in os.listdir(out_dir)
             if os.path.isdir(os.path.join(out_dir, d)) and d not in oracle]
for name in sorted(rows_only):
    files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
    print(f"[ROWS-ONLY] {name}: {n} rows")

print(f"\n{'FAIL' if fail else 'PASS'}: {fail} mismatches")
sys.exit(1 if fail else 0)
