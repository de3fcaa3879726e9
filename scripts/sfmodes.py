#!/usr/bin/env python3
"""Build the large-SF verification-mode table (round-11 verdict ask #2).

For every query in <out_local>/oracle_sql.json, establish HOW it was
verified at this SF and emit one markdown table row:

  oracle          — drivermimic (DuckDB) hash-match at this SF
  oracle (slice)  — same, but the query is one of the documented
                    bounded audit slices (constant id-prefix on BOTH
                    engines; see ROUND_NOTES "Bounded audit slices")
  bytediff        — oracle infeasible at this SF (timeout, or a DuckDB
                    resource-cap abort recognized by signature) or
                    engine-specific sketch (no oracle SQL): two
                    independent engine topologies (local[32] vs
                    local-cluster) must produce byte-identical results
                    (scripts/bytediff.py canon+hash)
  ORACLE-ERROR    — drivermimic died without PASS/FAIL and without a
                    recognized infeasibility signature; counts as a
                    fail and needs manual triage (a broken oracle must
                    not silently downgrade to topology bytediff, which
                    cannot see cross-engine divergence)
  FAIL            — cross-engine divergence; fix before shipping

Oracles run in a bounded process pool, each through drivermimic (which
self-caps DuckDB memory/temp at large SF) with a per-query timeout.

Usage:
  python3 scripts/sfmodes.py <sf_dir> <out_local> <out_cluster> \
      [timeout_sec] [parallel] [state.json] [> table.md]

state.json (optional) makes the sweep RESUMABLE: every per-name oracle
result is appended there as it lands, and names already recorded as
'oracle' / 'oracle (slice)' / 'bytediff'-by-timeout are not re-run —
so a second pass after fixing a resource cap or a query only re-runs
the names that actually need it.

<out_cluster> may be a not-yet-existing dir on the first pass: the
script then just prints which names NEED a cluster-topology run (exit
2), so the expensive cluster Verify only runs for the tail.
"""
import json, os, subprocess, sys
from concurrent.futures import ThreadPoolExecutor

SF = sys.argv[1]
LOCAL = sys.argv[2]
CLUSTER = sys.argv[3]
TIMEOUT = float(sys.argv[4]) if len(sys.argv) > 4 else 180.0
PAR = int(sys.argv[5]) if len(sys.argv) > 5 else 4
STATE = sys.argv[6] if len(sys.argv) > 6 else None

HERE = os.path.dirname(os.path.abspath(__file__))
# Documented bounded audit slices (ROUND_NOTES): exact ground-truth
# queries whose SQL itself pins a constant id-prefix on both engines.
SLICED = {"d08_ngram_jaccard", "d27_setsim_prefix_join", "d41_containment",
          "e06_embedding_neardups", "e10_embedding_clusters",
          "q111_record_linkage"}

# Signatures of a DuckDB oracle hitting its OWN resource caps (memory /
# temp-spill limits set by drivermimic at large SF). These are the
# documented "oracle infeasible at this SF" cases that legitimately
# downgrade to topology bytediff; any other hard death is ORACLE-ERROR.
INFEASIBLE_SIGS = ("Out of Memory", "OutOfMemory", "memory_limit",
                   "max_temp_directory_size", "Killed", "MemoryError")

oracle = json.load(open(f"{LOCAL}/oracle_sql.json"))
no_oracle = sorted(n for n in os.listdir(LOCAL)
                   if os.path.isdir(os.path.join(LOCAL, n)) and n not in oracle)


def run_oracle(name):
    if not os.path.isdir(f"{LOCAL}/{name}"):
        return name, "MISSING", "no spark output"
    try:
        # Per-worker DuckDB spill dir: PAR concurrent oracles sharing one
        # temp_directory delete each other's spill files (spurious
        # FAIL/crash — round-12 operational lesson, ROUND_NOTES).
        env = {**os.environ, "GRAFT_DUCKDB_TMP": f"/tmp/duckdb_oracle_tmp_{name}"}
        r = subprocess.run(
            [sys.executable, os.path.join(HERE, "drivermimic.py"), SF, LOCAL, name],
            capture_output=True, text=True, timeout=TIMEOUT, env=env)
        out = r.stdout + r.stderr
        if f"PASS {name}" in out:
            return name, "oracle", ""
        if f"FAIL {name}" in out:
            # keep the DIAGNOSTIC line (drivermimic's "FAIL <name>: ..."),
            # not the trailing "N pass, M fail" summary
            diag = next((l for l in out.splitlines()
                         if l.startswith(f"FAIL {name}")), out.strip()[-160:])
            # a DuckDB resource-cap abort inside the oracle surfaces as a
            # caught exception ("FAIL <name>: oracle error: Out of
            # Memory..."), not as a process death — same legitimate
            # infeasibility downgrade as the hard-death path below
            if any(sig in diag for sig in INFEASIBLE_SIGS):
                return name, "bytediff", \
                    "oracle infeasible (resource cap): " + diag[:160]
            return name, "FAIL", diag[:300]
        tail = out.strip()[-160:].replace("\n", " ")
        if any(sig in out for sig in INFEASIBLE_SIGS):
            return name, "bytediff", "oracle infeasible (resource cap): " + tail
        return name, "ORACLE-ERROR", "oracle died: " + tail
    except subprocess.TimeoutExpired:
        return name, "bytediff", f"oracle timeout >{TIMEOUT:.0f}s"


# resumable state: names whose recorded mode is terminal-good are not
# re-run; FAIL / ORACLE-ERROR / resource-cap rows are retried so a fixed
# query or a raised cap only costs the names that need it
prior = {}
if STATE and os.path.exists(STATE):
    prior = json.load(open(STATE))


def settled(mode, why):
    return mode == "oracle" or (mode == "bytediff" and "timeout" in why)


state_lock = __import__("threading").Lock()


def save_state(results):
    if STATE:
        with state_lock:
            json.dump(results, open(STATE, "w"), indent=0)


results = {n: tuple(v) for n, v in prior.items() if settled(*v)}
todo = sorted(n for n in oracle if n not in results)
print(f"{len(results)} settled from state, {len(todo)} to run", file=sys.stderr)
with ThreadPoolExecutor(PAR) as ex:
    for name, mode, why in ex.map(run_oracle, todo):
        results[name] = (mode, why)
        save_state(results)
        print(f"[{mode}] {name} {why}", file=sys.stderr)

for n in no_oracle:
    results[n] = ("bytediff", "engine-specific sketch (rows-only contract)")

need_diff = sorted(n for n, (m, _) in results.items() if m == "bytediff")
if not os.path.isdir(CLUSTER):
    print("cluster output dir missing; names needing a cluster run:")
    print(" ".join(need_diff))
    sys.exit(2)

diff_ok = {}
for n in need_diff:
    r = subprocess.run([sys.executable, os.path.join(HERE, "bytediff.py"),
                        LOCAL, CLUSTER, n], capture_output=True, text=True)
    diff_ok[n] = (r.returncode == 0 and f"PASS {n}" in r.stdout)
    print(f"[bytediff {'PASS' if diff_ok[n] else 'FAIL'}] {n}", file=sys.stderr)

rows, fails = [], 0
for n in sorted(results):
    mode, why = results[n]
    if mode == "oracle" and n in SLICED:
        mode, why = "oracle (slice)", "documented bounded audit slice"
    elif mode == "bytediff":
        mode = "bytediff PASS" if diff_ok.get(n) else "FAIL (bytediff)"
    if mode.startswith("FAIL") or mode in ("MISSING", "ORACLE-ERROR"):
        fails += 1
    rows.append((n, mode, why))

print("| query | mode @ this SF | note |")
print("|---|---|---|")
for n, mode, why in rows:
    print(f"| {n} | {mode} | {why} |")

from collections import Counter
print(f"\nsummary: {Counter(m for _, m, _ in rows)}; fails={fails}",
      file=sys.stderr)
sys.exit(1 if fails else 0)
