#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/selfcheck.py [sf_dir] [out_dir]

Assumes `sbt "runMain graft.Verify <sf_dir> <out_dir>"` already ran.
Loads every <out_dir>/<name> parquet result, runs the matching oracle SQL
from <out_dir>/oracle_sql.json in DuckDB over the sf_dir tables, sorts
columns by name, and compares values row-by-row.
"""
import sys, os, json, math
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{SF}/{t}.parquet"
    if os.path.isdir(p):  # ScaleGen output: a directory of part files
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(norm(r[i]) for i in order) for r in rows]

fails, passes, skipped = [], [], []
for name in sorted(os.listdir(OUT)):
    path = os.path.join(OUT, name)
    if not os.path.isdir(path):
        continue
    r = con.execute(f"SELECT * FROM '{path}/*.parquet'")
    scols = [d[0] for d in r.description]
    srows = r.fetchall()
    if name not in oracle:
        skipped.append((name, len(srows)))
        continue
    try:
        o = con.execute(oracle[name])
        ocols = [d[0] for d in o.description]
        orows = o.fetchall()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    if sorted(scols) != sorted(ocols):
        fails.append((name, f"schema mismatch: spark={sorted(scols)} oracle={sorted(ocols)}"))
        continue
    a, b = canon(scols, srows), canon(ocols, orows)
    if len(a) != len(b):
        fails.append((name, f"row count: spark={len(a)} oracle={len(b)}"))
        continue
    bad = None
    for i, (x, y) in enumerate(zip(a, b)):
        # exact compare; floats must match bit-for-bit per our determinism rules
        if x != y:
            eq = all((type(u) is float and type(v) is float and (u == v or (u != u and v != v)))
                     or u == v for u, v in zip(x, y))
            if not eq:
                bad = (i, x, y)
                break
    if bad:
        fails.append((name, f"row {bad[0]}: spark={bad[1]} oracle={bad[2]}"))
    else:
        passes.append((name, len(a)))

for n, c in passes:
    print(f"PASS  {n} ({c} rows)")
for n, c in skipped:
    print(f"SKIP  {n} (rows-only: {c} rows)")
for n, msg in fails:
    print(f"FAIL  {n}: {msg}")
print(f"\n{len(passes)} pass, {len(skipped)} rows-only, {len(fails)} fail")
sys.exit(1 if fails else 0)
