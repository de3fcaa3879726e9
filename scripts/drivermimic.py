#!/usr/bin/env python3
"""Mimic the DRIVER's compare (as inferred from CORRECTNESS_r01 traces):
spark result parquet -> pandas (pyarrow), oracle -> duckdb .df(),
sort columns by name, df.sort_values(all cols), then hash values.

Usage: python3 scripts/drivermimic.py [sf_dir] [out_dir] [names...]
"""
import sys, os, json, hashlib
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = set(sys.argv[3:])

con = duckdb.connect()
# Resource caps for large-SF sweeps: an uncapped DuckDB oracle at sf10
# spilled ~60 GB of temp and took the whole box down (round 11).
# GRAFT_DUCKDB_MEMLIMIT (e.g. "24GB") also routes temp spill to
# GRAFT_DUCKDB_TMP (default /tmp/duckdb_oracle_tmp) with a hard cap so a
# runaway oracle fails alone instead of starving the engine under test.
# DEFAULT-ON at large SF (round-11 verdict ask): when the sf dir holds
# >= 100 MB of parquet (sf1 is ~183 MB; the gate SFs are <= 17 MB), the
# caps apply even with no env var; GRAFT_DUCKDB_MEMLIMIT=none opts out.
def _dirsize(p):
    total = 0
    for root, _, files in os.walk(p):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total

_mem = os.environ.get("GRAFT_DUCKDB_MEMLIMIT")
if _mem is None and _dirsize(SF) >= 100 << 20:
    _mem = "24GB"
if _mem and _mem.lower() not in ("none", "off", "0"):
    _tmp = os.environ.get("GRAFT_DUCKDB_TMP", "/tmp/duckdb_oracle_tmp")
    os.makedirs(_tmp, exist_ok=True)
    con.execute(f"SET memory_limit='{_mem}'")
    con.execute(f"SET temp_directory='{_tmp}'")
    con.execute(f"SET max_temp_directory_size='{os.environ.get('GRAFT_DUCKDB_TMPLIMIT', '40GB')}'")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{SF}/{t}.parquet"
    if os.path.isdir(p):  # ScaleGen output: a directory of part files
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def dfhash(df):
    # plausible driver hash: stringified cell values
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(repr(v) for v in row) + "\n").encode())
    return h.hexdigest()

fails, passes = [], []
for name in sorted(os.listdir(OUT)):
    path = os.path.join(OUT, name)
    if not os.path.isdir(path) or name not in oracle:
        continue
    if ONLY and name not in ONLY:
        continue
    spark = pd.read_parquet(path)
    try:
        odf = con.execute(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))
        continue
    if sorted(spark.columns) != sorted(odf.columns):
        fails.append((name, f"schema: {sorted(spark.columns)} vs {sorted(odf.columns)}"))
        continue
    try:
        a, b = canon(spark), canon(odf)
    except Exception as e:
        fails.append((name, f"sort error: {type(e).__name__}: {e}"))
        continue
    ha, hb = dfhash(a), dfhash(b)
    if len(a) != len(b):
        fails.append((name, f"rows {len(a)} vs {len(b)}"))
    elif ha != hb:
        # find first differing cell for diagnosis
        diff = None
        for i in range(len(a)):
            for c in a.columns:
                va, vb = a[c].iloc[i], b[c].iloc[i]
                if repr(va) != repr(vb):
                    diff = (i, c, repr(va), type(va).__name__, repr(vb), type(vb).__name__)
                    break
            if diff:
                break
        fails.append((name, f"hash diff; first cell diff: {diff}; dtypes spark={dict(a.dtypes.astype(str))} oracle={dict(b.dtypes.astype(str))}"))
    else:
        passes.append(name)

for n in passes:
    print(f"PASS {n}")
for n, m in fails:
    print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} pass, {len(fails)} fail")
