#!/usr/bin/env python3
"""Large-SF sweep driver: drivermimic semantics with a per-query oracle
timeout. At sf>=1 a handful of oracles are brute-force by design (sound
at gate SF, quadratic above it); this wrapper runs every query whose
oracle finishes inside the budget and reports the rest as EXCLUDED
(timeout) rather than stalling the sweep. Usage:
  python3 scripts/sweeptimed.py <sfdir> <verify_out> [timeout_sec] [names...]
"""
import json, os, sys, subprocess

SF = sys.argv[1]
OUT = sys.argv[2]
TIMEOUT = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
NAMES = sys.argv[4:]

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
names = NAMES if NAMES else sorted(oracle.keys())

passed, failed, excluded = [], [], []
for n in names:
    if n not in oracle:
        continue
    if not os.path.isdir(f"{OUT}/{n}"):
        excluded.append((n, "no spark output"))
        continue
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "drivermimic.py"),
             SF, OUT, n],
            capture_output=True, text=True, timeout=TIMEOUT)
        out = r.stdout + r.stderr
        if f"PASS {n}" in out:
            passed.append(n)
        elif f"FAIL {n}" in out:
            failed.append((n, out.strip().splitlines()[-3:]))
        else:
            excluded.append((n, "no verdict: " + out.strip()[-200:]))
    except subprocess.TimeoutExpired:
        excluded.append((n, f"oracle timeout >{TIMEOUT:.0f}s"))

print(f"\n{len(passed)} pass, {len(failed)} fail, {len(excluded)} excluded")
for n, why in excluded:
    print(f"EXCLUDED {n}: {why}")
for n, why in failed:
    print(f"FAIL {n}: {why}")
sys.exit(1 if failed else 0)
