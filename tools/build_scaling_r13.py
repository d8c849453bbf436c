#!/usr/bin/env python3
"""Assemble SCALING_r13.json from the round-13 evidence (dev tool; run
after the ladder bench JSONs, steady probes, spot-checks, and the
multi-process probes exist).

HARD RULES:
 1. (r9 lesson) A rung containing ANY failed query (-1 in the per-query
    map, or a nonempty `failed` list) REFUSES to assemble.
 2. (r10 lesson, r12 VERDICT #6 widened) MOVER AUTO-FLAGGING at sf100
    AND sf10: every query whose wall moved >2.5x vs the baseline rung —
    whatever its absolute wall — must have a steady-probe row, or the
    builder refuses. sf100's baseline is SCALING_r11's rung (r12 never
    produced a clean sf100 rung — five OOM/ENOSPC cuts, judge-reproduced);
    sf10's baseline is the r12 rung file the judge audited.
 3. (r11 ADVICE, HARDENED in r12) Spot-check verdicts are INGESTED from
    the machine-readable spot_results.json files tools/spot_check.py
    emits AND the expected per-rung query set must be COVERED: a missing
    file, a missing verdict, or a FAIL all refuse assembly.
 4. (r11 VERDICT #5) Discarded rungs are NAMED: every triage bundle
    under /tmp/ladder_r13_discarded/ is listed in the artifact.
"""
import glob
import json
import os
import re
import sys

MOVER_RATIO = 2.5

# the dial-dependent / lineage queries every rung's spot check must
# cover. q_knn_routed and q_knn_routed_range are fixture-backed — their
# oracles are scale-independent and run at the driver gate; no spot row
# needed.
EXPECTED_SPOTS = {
    "sf1": ["q_knn_join", "q_knn_join_mp", "q_knn_filtered",
            "q_knn_filtered_part", "q_knn_incr", "q_knn_stream",
            "q_knn_part_incr", "q_ledger_binpack", "q_ledger_constraints"],
    "sf10": ["q_knn_filtered_part", "q_knn_stream", "q_knn_part_incr"],
}

# per-rung mover baselines: (baseline json path, key for query map,
# baseline label). sf100 falls back to SCALING_r11 — the last CLEAN
# sf100 rung in existence; r12's five cuts all died (judge-reproduced
# executor OOM) and its rung files were refused by design.
BASELINES = {
    "sf10": ("/tmp/bench_sf10_r12.json", "queries", "r12 rung file"),
    "sf100": ("SCALING_r11.json", "queries_sf100", "SCALING_r11"),
}
PROBE_FILES = {
    "sf10": "/tmp/probe_sf10_movers_r13.txt",
    "sf100": "/tmp/probe_sf100_movers_r13.txt",
}

out = {
    "round": 13,
    "note": "Round-13 evidence: all declared queries in-suite at every "
            "rung INCLUDING a clean sf100 (the r12 failure: in-suite "
            "executor OOM at 80g/local[32]; this rung runs local[16] + "
            "SPARK_GRAFT_SHUFFLE=32 + 100g — lower peak concurrent "
            "execution-page demand, unchanged per-partition data). "
            "Adds q_knn_routed_range (generic-predicate routed fallback "
            "under the oracle) and the memoized routed serves; mover "
            "auto-flag now gates sf10 AND sf100 (r12 VERDICT #6); "
            "triage bundles carry victim.txt (r12 VERDICT #5).",
}

failures = []

# disk fingerprint (hand-measured before attributing any wall move)
fp_path = "/tmp/disk_fingerprint_r13.json"
if os.path.exists(fp_path):
    out["disk_fingerprint"] = json.load(open(fp_path))
else:
    failures.append("missing disk fingerprint /tmp/disk_fingerprint_r13.json")

# ladder bench JSONs (full in-suite runs, all declared queries)
for sf, path in [("sf0.1", "/tmp/bench_sf01_r13.json"),
                 ("sf1", "/tmp/bench_sf1_r13.json"),
                 ("sf10", "/tmp/bench_sf10_r13.json"),
                 ("sf100", "/tmp/bench_sf100_r13.json")]:
    if not os.path.exists(path):
        failures.append(f"{sf}: missing rung {path}")
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
    if d.get("fp"):
        out[f"bench_fp_{key}"] = d["fp"]

# steady probes: PROBE <query> <dir> first=<s> second=<s> lines
def read_probes(path):
    probes = {}
    if os.path.exists(path):
        for line in open(path):
            m = re.match(r"PROBE (\S+) (\S+) first=([\d.]+) second=([\d.]+)",
                         line)
            if m:
                probes[m.group(1)] = {
                    "dir": m.group(2), "first_s": float(m.group(3)),
                    "steady_s": float(m.group(4))}
    return probes

# mover auto-flag at sf10 AND sf100: ratio > 2.5x at ANY wall vs the
# rung's baseline; every flagged query must have a steady-probe row in
# that rung's probe file or we refuse
for rung, (bpath, bkey, blabel) in BASELINES.items():
    if f"queries_{rung}" not in out:
        continue
    if not os.path.exists(bpath):
        failures.append(f"{rung}: mover baseline {bpath} missing")
        continue
    prev = json.load(open(bpath)).get(bkey, {})
    cur = out[f"queries_{rung}"]
    probes = read_probes(PROBE_FILES[rung])
    if probes:
        out[f"{rung}_mover_steady"] = probes
    flagged = sorted(
        q for q, v in cur.items()
        if q in prev and prev[q] > 0 and v / prev[q] > MOVER_RATIO)
    out[f"{rung}_movers_flagged"] = {
        q: {"baseline_s": prev[q], "r13_s": cur[q], "baseline": blabel,
            "ratio": round(cur[q] / prev[q], 2)} for q in flagged}
    unprobed = [q for q in flagged if q not in probes]
    if unprobed:
        failures.append(
            f"{rung} movers flagged (> {MOVER_RATIO}x vs {blabel}) but "
            f"NOT steady-probed: {unprobed}")

# machine-readable spot-check verdicts — REQUIRED coverage per rung
spots = {}
found_tags = {}
for path in sorted(glob.glob("/tmp/verify_r13_sf*/spot_results.json")):
    d = json.load(open(path))
    tag = d["sf_dir"].rstrip("/").split("/")[-1]
    found_tags[tag] = d["results"]
    for q, v in d["results"].items():
        spots[f"{q}_{tag}"] = v
        if not v["pass"]:
            failures.append(f"spot-check FAIL: {q} at {d['sf_dir']}")
for tag, expected in EXPECTED_SPOTS.items():
    got = found_tags.get(tag)
    if got is None:
        failures.append(f"spot-check rung {tag}: spot_results.json MISSING "
                        f"(expected verdicts for {expected})")
        continue
    missing = [q for q in expected if q not in got]
    if missing:
        failures.append(f"spot-check rung {tag}: missing verdicts {missing}")
if spots:
    out["spot_r13"] = spots

# multi-process probes: create-exclusive (occ) and conditional-put (cas)
for name, path in [("occ_multiproc", "/tmp/occ_multiproc_r13.json"),
                   ("cas_multiproc", "/tmp/cas_multiproc_r13.json")]:
    if os.path.exists(path):
        out[name] = json.load(open(path))
    else:
        failures.append(f"missing multi-process probe record {path}")

# discarded rungs leave named triage bundles (r11 VERDICT #5)
bundles = sorted(glob.glob("/tmp/ladder_r13_discarded/*"))
out["discarded_runs"] = [os.path.basename(b) for b in bundles]

# full-gate record (written by the round-close gate run)
gate_path = "/tmp/gate_full_r13.json"
if os.path.exists(gate_path):
    g = json.load(open(gate_path))
    out["gate_full"] = g
    if g.get("fail", 1) != 0:
        failures.append(f"full gate has failures: {g}")
else:
    failures.append("missing full-gate record /tmp/gate_full_r13.json")

if failures:
    print("REFUSING to assemble SCALING_r13.json:", file=sys.stderr)
    for f in failures:
        print("  " + f, file=sys.stderr)
    sys.exit(1)

json.dump(out, open("SCALING_r13.json", "w"), indent=1)
print("SCALING_r13.json written:", list(out.keys()))
