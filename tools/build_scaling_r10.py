#!/usr/bin/env python3
"""Assemble SCALING_r10.json from the round-10 evidence (dev tool; run
after the ladder bench JSONs and the sf100 steady probes exist in /tmp).

HARD RULE (judge r9 item 1): a rung containing ANY failed query (-1 in
the per-query map, or a nonempty `failed` list) REFUSES to assemble —
a dead query must never again hide inside a shipped rung."""
import json
import os
import re
import sys

out = {
    "round": 10,
    "note": "Round-10 evidence: the sf100 rung re-cut against the SHIPPED "
            "engine (factorized q_tpch2/q_tpch4/q_tpch17 in-suite; zero "
            "failed queries enforced by this builder AND by Bench's "
            "n_failed/exit-code path), steady probes for the seven sf100 "
            "movers the r9 judge flagged (classified against the re-pinned "
            "disk fingerprint below), and the three new declared queries "
            "(q_knn_filtered, q_ledger_constraints, q_ledger_binpack) "
            "in-suite at every rung.",
    "disk_fingerprint": {
        "note": "re-measured this round on the quiet host (PERF.md "
                "discipline: fingerprint before attributing wall moves). "
                "r9 host: cold read ~93 MB/s, write 276 MB/s.",
        "cold_read_mb_s": 228.1,
        "warm_reread_s_1p8gb": 0.26,
        "write_mb_s_2gib_fdatasync": 510.0,
    },
}

# steady probes of the seven r9-flagged sf100 movers (+ the three
# factorized TPC-H rewrites for continuity with the r9 steady numbers)
probes = "/tmp/probe_sf100_movers_r10.txt"
if os.path.exists(probes):
    rows = {}
    for line in open(probes):
        m = re.match(r"PROBE (\S+) (\S+) first=([\d.]+) second=([\d.]+)", line)
        if m:
            rows[m.group(1)] = {"dir": m.group(2), "first_s": float(m.group(3)),
                                "steady_s": float(m.group(4))}
    if rows:
        out["sf100_mover_steady"] = rows

# scaled oracle spot-checks for the round's new queries (hand-recorded
# from tools/spot_check.py runs; the harness prints PASS/FAIL + rows)
out["spot_r10"] = {
    "q_knn_filtered_sf1": {
        "result": "PASS", "rows": 60000, "n_embeddings": 20000,
        "note": "trie dial (p0=7, maxD=15); dial-aware oracle via "
                "knnFilteredOracleSqlFor — served post-filter arm + "
                "exact escalation arm both mirrored in DuckDB"},
    "q_knn_incr_sf1": {
        "result": "PASS", "rows": 61086, "n_embeddings": 20000,
        "note": "the CDF-MAINTAINED index serving at the trie dial "
                "hash-matches DuckDB recomputing the lineage-final "
                "corpus from scratch through the same trie chain "
                "(knnIncrOracleSqlFor; dial set by the bootstrap "
                "count, occupancies by the final corpus — exactly "
                "the maintained histogram's law)"},
    "q_knn_join_sf1": {"result": "PASS", "rows": 60000,
        "note": "re-checked after the generator's corpus-CTE "
                "parameterization (regression guard)"},
    "q_knn_join_mp_sf1": {"result": "PASS", "rows": 60000,
        "note": "ditto, P=2"},
    "q_ledger_constraints_sf1": {"result": "PASS", "rows": 46216},
    "q_ledger_binpack_sf1": {"result": "PASS", "rows": 53787},
    "gate_full": {
        "result": "197 pass, 0 fail",
        "note": "full sf0.01 Verify + oracle_check at round-close HEAD "
                "(also: 196/196 mid-round before q_ledger_binpack, and "
                "per-change subset re-checks)"},
}

# ladder bench JSONs (full in-suite runs, all declared queries)
failures = []
for sf, path in [("sf0.1", "/tmp/bench_sf01_r10.json"),
                 ("sf1", "/tmp/bench_sf1_r10.json"),
                 ("sf10", "/tmp/bench_sf10_r10.json"),
                 ("sf100", "/tmp/bench_sf100_r10.json")]:
    if not os.path.exists(path):
        print(f"MISSING rung: {path}", file=sys.stderr)
        failures.append(f"{sf}: missing")
        continue
    d = json.load(open(path))
    bad = sorted([q for q, v in d["queries"].items() if v < 0])
    if d.get("failed") or d.get("n_failed", 0) or bad:
        failures.append(f"{sf}: failed={d.get('failed', bad)}")
        continue
    key = sf.replace(".", "")
    out[f"{key}_total_sec"] = d["value"]
    out[f"n_queries_{key}"] = len(d["queries"])
    out[f"n_failed_{key}"] = d.get("n_failed", 0)
    out[f"queries_{key}"] = d["queries"]

if failures:
    print("REFUSING to assemble SCALING_r10.json — rungs with failures:",
          file=sys.stderr)
    for f in failures:
        print("  " + f, file=sys.stderr)
    sys.exit(1)

json.dump(out, open("SCALING_r10.json", "w"), indent=1)
print("SCALING_r10.json written:", list(out.keys()))
