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
The per-worker DuckDB temp cap is the TOTAL cap (GRAFT_DUCKDB_TMPLIMIT,
default 40GB) divided by the pool width, so PAR concurrent oracles
cannot spill PAR * total in aggregate; each worker's spill dir is
removed when its run finishes.

Usage:
  python3 scripts/sfmodes.py <sf_dir> <out_local> <out_cluster> \
      [timeout_sec] [parallel] [state.json] [> table.md]

state.json (optional) makes the sweep RESUMABLE: every per-name oracle
result is appended there as it lands, together with a hash of the
query's DEFINITION (its oracle SQL + the mtime of the spark output's
_SUCCESS marker). A name is skipped on resume only when its recorded
mode is terminal-good ('oracle', or 'bytediff' by timeout) AND its
definition hash is unchanged — so editing a query, regenerating its
spark output, or fixing its oracle SQL automatically re-runs exactly
the names that changed. FAIL / ORACLE-ERROR / resource-cap rows are
always retried.

<out_cluster> may be a not-yet-existing dir on the first pass: the
script then just prints which names NEED a cluster-topology run (exit
2), so the expensive cluster Verify only runs for the tail.
"""
import hashlib, json, os, re, shutil, subprocess, sys, tempfile, threading
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
          "q111_record_linkage",
          # round-15 sliced twins of the recursive-closure dedup family
          # (full rows stay bytediff at sf10; the twin carries the
          # oracle-semantics evidence there)
          "d09s_dedup_clusters_sliced", "d14s_clean_corpus_sliced",
          "d34s_leakage_split_sliced", "d40s_canonical_pick_sliced",
          "e28s_knn_graph_sliced", "e29s_label_prop_sliced",
          "e39s_hubness_sliced",
          "d28s_training_manifest_sliced", "d66s_dedup_impact_sliced",
          "q95s_skyline_sliced", "q66s_range_join_sliced",
          "q77s_triangle_count_sliced", "q75s_graph_pagerank_sliced",
          "d49s_dedup_sweep_sliced", "d59s_cdc_chunks_sliced",
          # round-16 sliced twins: every remaining oracle-capped row
          # with expressible oracle SQL now has one (full rows stay
          # bytediff at sf10)
          "e43s_incremental_knn_sliced", "e44s_knn_deletion_sliced",
          "q149s_scd2_lookup_sliced",
          "e30s_triplet_mining_sliced", "e31s_graph_search_sliced",
          "e34s_knn_outliers_sliced", "e38s_mutual_nn_sliced",
          "e40s_nn_descent_sliced", "e42s_graph_recall_sliced",
          "e47s_nn_descent_reverse_sliced", "q143s_modularity_sliced",
          "q128s_kcore_sliced", "q138s_hyperball_sliced",
          "q135s_ppr_sliced"}

# Signatures of a DuckDB oracle hitting its OWN resource caps (memory /
# temp-spill limits set by drivermimic at large SF). These are the
# documented "oracle infeasible at this SF" cases that legitimately
# downgrade to topology bytediff. DuckDB-SPECIFIC strings only: broad
# ones like "Killed" or "MemoryError" would let a harness bug or an
# OOM-killed python silently downgrade instead of surfacing as
# ORACLE-ERROR (the exact silent-downgrade failure mode the
# ORACLE-ERROR classification exists to prevent).
INFEASIBLE_SIGS = ("Out of Memory", "OutOfMemoryException",
                   "memory_limit", "max_temp_directory_size")

oracle = json.load(open(f"{LOCAL}/oracle_sql.json"))
no_oracle = sorted(n for n in os.listdir(LOCAL)
                   if os.path.isdir(os.path.join(LOCAL, n)) and n not in oracle)


def defhash(name):
    """Hash of what this oracle run verifies: the oracle SQL plus the
    identity (mtime+size) of the spark output parquet it compares
    against. Changing either re-runs the name on resume."""
    h = hashlib.sha256(oracle.get(name, "").encode())
    marker = os.path.join(LOCAL, name, "_SUCCESS")
    try:
        st = os.stat(marker)
        h.update(f"|{st.st_mtime_ns}".encode())
    except OSError:
        h.update(b"|no-marker")
    for f in sorted(os.listdir(os.path.join(LOCAL, name))) \
            if os.path.isdir(os.path.join(LOCAL, name)) else []:
        if f.endswith(".parquet"):
            st = os.stat(os.path.join(LOCAL, name, f))
            h.update(f"|{f}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


def _split_limit(total, par):
    """'40GB' / 4 -> '10GB' (floor, min 1), any common DuckDB size unit
    (KB/MB/GB/TB, KiB/MiB/GiB/TiB). Unparseable -> passthrough WITH a
    stderr warning: passthrough gives EACH of the PAR workers the total
    cap, so the aggregate-spill bound this divide exists for is gone."""
    m = re.fullmatch(r"(\d+)\s*([KMGT]i?B)", total.strip(), re.IGNORECASE)
    if not m:
        print(f"sfmodes: WARNING: cannot parse GRAFT_DUCKDB_TMPLIMIT "
              f"{total!r}; each of {par} workers gets the FULL cap "
              f"(aggregate spill unbounded)", file=sys.stderr)
        return total
    return f"{max(1, int(m.group(1)) // max(1, par))}{m.group(2)}"


TMP_PER_WORKER = _split_limit(os.environ.get("GRAFT_DUCKDB_TMPLIMIT", "40GB"), PAR)


def run_oracle(name):
    if not os.path.isdir(f"{LOCAL}/{name}"):
        return name, "MISSING", "no spark output"
    # Per-worker DuckDB spill dir: PAR concurrent oracles sharing one
    # temp_directory delete each other's spill files (spurious
    # FAIL/crash — round-12 operational lesson, ROUND_NOTES). The
    # per-worker cap is total/PAR so the aggregate stays bounded.
    # mkdtemp (not a fixed per-name path): two concurrent sfmodes
    # invocations (an sf1 and an sf10 sweep) sharing a query name would
    # otherwise rmtree each other's LIVE spill dir in finally — the
    # cross-process variant of the exact clobbering the per-name dir
    # was introduced to prevent.
    tmpdir = tempfile.mkdtemp(
        prefix=f"duckdb_oracle_{os.path.basename(SF.rstrip(os.sep))}_{name}_")
    try:
        env = {**os.environ, "GRAFT_DUCKDB_TMP": tmpdir,
               "GRAFT_DUCKDB_TMPLIMIT": TMP_PER_WORKER}
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
            # Memory..."). Match the signature ON THE DIAGNOSTIC LINE
            # only — the same legitimate infeasibility downgrade as the
            # hard-death path below.
            if any(sig in diag for sig in INFEASIBLE_SIGS):
                return name, "bytediff", \
                    "oracle infeasible (resource cap): " + diag[:160]
            return name, "FAIL", diag[:300]
        tail = out.strip()[-160:].replace("\n", " ")
        if any(sig in out for sig in INFEASIBLE_SIGS):
            return name, "bytediff", "oracle infeasible (resource cap): " + tail
        # died without PASS/FAIL and without a recognized DuckDB cap
        # signature (includes SIGKILL-style deaths): manual triage, never
        # a silent downgrade
        return name, "ORACLE-ERROR", "oracle died: " + tail
    except subprocess.TimeoutExpired:
        return name, "bytediff", f"oracle timeout >{TIMEOUT:.0f}s"
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


# resumable state: {name: [mode, why, defhash]}. A name is skipped only
# when terminal-good AND its definition hash matches; FAIL /
# ORACLE-ERROR / resource-cap rows are retried so a fixed query or a
# raised cap only costs the names that actually need it. Legacy
# 2-element entries (pre-hash) are treated as stale and re-run.
prior = {}
if STATE and os.path.exists(STATE):
    prior = json.load(open(STATE))


def settled(entry, name):
    if len(entry) != 3 or entry[2] != defhash(name):
        return False
    mode, why = entry[0], entry[1]
    return mode == "oracle" or (mode == "bytediff" and "timeout" in why)


state_lock = threading.Lock()


def save_state(results):
    if STATE:
        with state_lock:
            json.dump(results, open(STATE, "w"), indent=0)


results = {n: (v[0], v[1]) for n, v in prior.items()
           if n in oracle and settled(v, n)}
todo = sorted(n for n in oracle if n not in results)
print(f"{len(results)} settled from state, {len(todo)} to run", file=sys.stderr)
state = {n: [m, w, defhash(n)] for n, (m, w) in results.items()}
with ThreadPoolExecutor(PAR) as ex:
    for name, mode, why in ex.map(run_oracle, todo):
        results[name] = (mode, why)
        state[name] = [mode, why, defhash(name)]
        save_state(state)
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
