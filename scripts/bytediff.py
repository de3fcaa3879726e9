#!/usr/bin/env python3
"""Byte-equality protocol for oracle-infeasible large-SF queries: compare
two graft.Verify output dirs (e.g. a local[32] run vs a local-cluster run
of the same queries at the same SF) with drivermimic's exact canon+hash.
Two independent engine topologies producing identical bytes is the
verification mode of record where the DuckDB oracle itself cannot run
(documented first for q138's sf1 oracle OOM in round 10).

Usage: python3 scripts/bytediff.py <out_dir_a> <out_dir_b> [names...]
"""
import sys, os, hashlib
import pandas as pd

A, B = sys.argv[1], sys.argv[2]
ONLY = set(sys.argv[3:])


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def dfhash(df):
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(repr(v) for v in row) + "\n").encode())
    return h.hexdigest()


names = sorted(n for n in os.listdir(A)
               if os.path.isdir(os.path.join(A, n)) and (not ONLY or n in ONLY))
fails, passes, missing = [], [], []
for n in names:
    pb = os.path.join(B, n)
    if not os.path.isdir(pb):
        missing.append(n)
        continue
    da, db = pd.read_parquet(os.path.join(A, n)), pd.read_parquet(pb)
    if sorted(da.columns) != sorted(db.columns):
        fails.append((n, "schema"))
        continue
    ha, hb = dfhash(canon(da)), dfhash(canon(db))
    if len(da) == len(db) and ha == hb:
        passes.append(n)
        print(f"PASS {n} rows={len(da)}")
    else:
        fails.append((n, f"rows {len(da)} vs {len(db)}, hash {'==' if ha == hb else '!='}"))
        print(f"FAIL {n}: rows {len(da)} vs {len(db)}")

print(f"\n{len(passes)} byte-equal, {len(fails)} differ, {len(missing)} missing in B")
for n, why in fails:
    print(f"FAIL {n}: {why}")
sys.exit(1 if fails else 0)
