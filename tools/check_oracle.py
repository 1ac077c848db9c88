#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: check_oracle.py <verifyOutDir> <sfDir>
Reads each <name>/ parquet result + oracle_sql.json, runs the oracle in
DuckDB over the sfDir parquet tables, and reports row/schema/value diffs.
"""
import sys, json, glob, os
import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    res_dir = f"{out_dir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"[MISS] {name}: no spark result dumped")
        fail += 1
        continue
    try:
        mine = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
        theirs = con.sql(sql).df()
    except Exception as e:
        print(f"[ERR ] {name}: {str(e)[:200]}")
        fail += 1
        continue
    mc, tc = sorted(mine.columns), sorted(theirs.columns)
    if [c.lower() for c in mc] != [c.lower() for c in tc]:
        print(f"[COLS] {name}: {mc} vs {tc}")
        fail += 1
        continue
    if len(mine) != len(theirs):
        print(f"[ROWS] {name}: {len(mine)} vs {len(theirs)}")
        fail += 1
        continue
    m = mine[mc].copy()
    t = theirs[tc].copy()
    t.columns = mc  # align case
    key = [c for c in mc]
    try:
        ms = m.sort_values(key, ignore_index=True)
        ts = t.sort_values(key, ignore_index=True)
    except Exception:
        ms = m.astype(str).sort_values(key, ignore_index=True)
        ts = t.astype(str).sort_values(key, ignore_index=True)
    diffs = []
    for c in mc:
        a, b = ms[c], ts[c]
        try:
            neq = ~((a == b) | (a.isna() & b.isna()))
        except Exception:
            neq = a.astype(str) != b.astype(str)
        if neq.any():
            i = neq.idxmax()
            diffs.append(f"{c}[{i}]: {a[i]!r} vs {b[i]!r} ({int(neq.sum())} rows)")
    if diffs:
        print(f"[DIFF] {name}: " + "; ".join(diffs[:3]))
        fail += 1
    else:
        print(f"[ OK ] {name} ({len(mine)} rows)")
print(f"\n{len(oracle) - fail}/{len(oracle)} oracle-checked queries match")
sys.exit(1 if fail else 0)
