#!/usr/bin/env python3
"""Assemble SCALING_r09.json from the round-9 evidence (dev tool; run
after the outlier steady probes, the multi-process OCC stress, the
spot-check JSONs, and the ladder bench JSONs exist in /tmp)."""
import json
import os
import re

out = {
    "round": 9,
    "note": "Round-9 evidence: branch rebase/cherry-pick onto an advanced "
            "parent (q_ledger_rebase - the busy-table WAP cycle), the "
            "multi-probe kNN dial declared as an oracle query "
            "(q_knn_join_mp, P=2 pinned), incremental view maintenance as "
            "a one-call API (defineView/refreshView + the factorized join "
            "form; both r8 IVM queries re-expressed, byte-identical), "
            "O(1) published-branch checks via a _published marker, "
            "monotone marker-file staged high-water mark, and OCC "
            "serializability certified across REAL PROCESSES "
            "(ProbeOccMulti: N child JVMs racing one table). The sf100 "
            "outlier cluster from r8 re-probed steady on a quiet host "
            "(judge item 1) - see sf100_outlier_steady below and PERF.md.",
}

# steady re-probes of the eight r8 sf100 outliers (ProbeScale transcript)
probes = "/tmp/probe_sf100_outliers_r9.txt"
if os.path.exists(probes):
    rows = {}
    for line in open(probes):
        m = re.match(r"PROBE (\S+) (\S+) first=([\d.]+) second=([\d.]+)", line)
        if m:
            rows.setdefault(m.group(1), []).append(
                {"dir": m.group(2), "first_s": float(m.group(3)),
                 "steady_s": float(m.group(4))})
    if rows:
        out["sf100_outlier_steady"] = rows

# steady probes of the three factorized TPC-H rewrites (post-rung)
rw = "/tmp/probe_sf100_rewrites_r9.txt"
if os.path.exists(rw):
    rows = {}
    for line in open(rw):
        m = re.match(r"PROBE (\S+) (\S+) first=([\d.]+) second=([\d.]+)", line)
        if m:
            rows[m.group(1)] = {"dir": m.group(2), "first_s": float(m.group(3)),
                                "steady_s": float(m.group(4))}
    if rows:
        out["sf100_factorized_rewrites"] = {
            "note": "q_tpch2/q_tpch4/q_tpch17 rewritten mid-round to the "
                    "factorized no-fact-sort shapes (broadcast the filtered "
                    "dim, restrict lineitem once, dim-cardinality agg "
                    "shuffle); steady quiet-host probes. The two-pass sf100 "
                    "rung predates the rewrites for these three; the "
                    "single-pass re-run (if present as sf100b) includes "
                    "them.",
            "probes": rows,
        }

# multi-process OCC stress results (one JSON line per run)
occ = "/tmp/occ_multiproc_r9.txt"
if os.path.exists(occ):
    runs = []
    for line in open(occ):
        line = line.strip()
        if line.startswith('{"metric":"occ_multiproc"'):
            runs.append(json.loads(line))
    if runs:
        out["occ_multiproc"] = runs

# scaled oracle spot-checks for the round's new/changed queries
for tag, path in [("spot_r9", "/tmp/spot_r9.json")]:
    if os.path.exists(path):
        out[tag] = json.load(open(path))

# ladder bench JSONs (full in-suite runs, all declared queries);
# sf100b = the single-pass re-run AFTER the factorized rewrites landed
for sf, path in [("sf0.1", "/tmp/bench_sf01_r9.json"),
                 ("sf1", "/tmp/bench_sf1_r9.json"),
                 ("sf10", "/tmp/bench_sf10_r9.json"),
                 ("sf100", "/tmp/bench_sf100_r9.json"),
                 ("sf100b", "/tmp/bench_sf100_r9b.json")]:
    if not os.path.exists(path):
        continue
    d = json.load(open(path))
    key = sf.replace(".", "")
    out[f"{key}_total_sec"] = d["value"]
    out[f"n_queries_{key}"] = len(d["queries"])
    out[f"queries_{key}"] = d["queries"]

json.dump(out, open("SCALING_r09.json", "w"), indent=1)
print("SCALING_r09.json written:", list(out.keys()))
