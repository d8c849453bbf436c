#!/usr/bin/env python3
"""Assemble SCALING_r12.json from the round-12 evidence (dev tool; run
after the ladder bench JSONs, steady probes, spot-checks, and the
multi-process probes exist).

HARD RULES:
 1. (r9 lesson) A rung containing ANY failed query (-1 in the per-query
    map, or a nonempty `failed` list) REFUSES to assemble.
 2. (r10 lesson) MOVER AUTO-FLAGGING at the widened threshold: every
    sf100 query whose wall moved >2.5x vs the previous round's rung —
    whatever its absolute wall — must have a steady-probe row, or the
    builder refuses.
 3. (r11 ADVICE, HARDENED) Spot-check verdicts are INGESTED from the
    machine-readable spot_results.json files tools/spot_check.py emits
    AND the expected per-rung query set must be COVERED: a missing
    file, a missing verdict, or a FAIL all refuse assembly. r11's
    builder made the whole section optional, so an unrun spot check
    read as success — the exact hand-claim class the tooling exists to
    refuse (q_knn_stream shipped without its sf1 row).
 4. (r11 VERDICT #5) Discarded rungs are NAMED: every triage bundle
    under /tmp/ladder_r12_discarded/ is listed in the artifact.
"""
import glob
import json
import os
import re
import sys

MOVER_RATIO = 2.5
PREV = "SCALING_r11.json"

# the dial-dependent / lineage queries every rung's spot check must
# cover (judge item 1: q_knn_stream at sf1 AND sf10; the two r12
# additions join the set). q_knn_routed is fixture-backed — its oracle
# is scale-independent and runs at the driver gate; no spot row needed.
EXPECTED_SPOTS = {
    "sf1": ["q_knn_join", "q_knn_join_mp", "q_knn_filtered",
            "q_knn_filtered_part", "q_knn_incr", "q_knn_stream",
            "q_knn_part_incr", "q_ledger_binpack", "q_ledger_constraints"],
    "sf10": ["q_knn_filtered_part", "q_knn_stream", "q_knn_part_incr"],
}

out = {
    "round": 12,
    "note": "Round-12 evidence: 203 declared queries in-suite at every "
            "rung; q_knn_stream spot rows at sf1 AND sf10 (the r11 gap) "
            "plus the two r12 additions (q_knn_routed: automatic "
            "filtered-ANN arm routing, fixture-backed oracle; "
            "q_knn_part_incr: CDF-maintained partition tries) — spot "
            "coverage is now REQUIRED per rung (missing verdicts refuse "
            "assembly, not just FAILs); multi-process conditional-put "
            "stress (ProbeCasMulti) alongside the create-exclusive one; "
            "Bench embeds its own disk fingerprint; discarded rungs "
            "leave named triage bundles.",
}

failures = []

# disk fingerprint (hand-measured before attributing any wall move)
fp_path = "/tmp/disk_fingerprint_r12.json"
if os.path.exists(fp_path):
    out["disk_fingerprint"] = json.load(open(fp_path))
else:
    failures.append("missing disk fingerprint /tmp/disk_fingerprint_r12.json")

# ladder bench JSONs (full in-suite runs, all declared queries)
for sf, path in [("sf0.1", "/tmp/bench_sf01_r12.json"),
                 ("sf1", "/tmp/bench_sf1_r12.json"),
                 ("sf10", "/tmp/bench_sf10_r12.json"),
                 ("sf100", "/tmp/bench_sf100_r12.json")]:
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
probes = {}
probe_path = "/tmp/probe_sf100_movers_r12.txt"
if os.path.exists(probe_path):
    for line in open(probe_path):
        m = re.match(r"PROBE (\S+) (\S+) first=([\d.]+) second=([\d.]+)", line)
        if m:
            probes[m.group(1)] = {
                "dir": m.group(2), "first_s": float(m.group(3)),
                "steady_s": float(m.group(4))}
if probes:
    out["sf100_mover_steady"] = probes

# mover auto-flag: vs the r11 rung, ratio > 2.5x at ANY wall; every
# flagged query must have a steady-probe row or we refuse
if os.path.exists(PREV) and "queries_sf100" in out:
    prev = json.load(open(PREV)).get("queries_sf100", {})
    cur = out["queries_sf100"]
    flagged = sorted(
        q for q, v in cur.items()
        if q in prev and prev[q] > 0 and v / prev[q] > MOVER_RATIO)
    out["sf100_movers_flagged"] = {
        q: {"r11_s": prev[q], "r12_s": cur[q],
            "ratio": round(cur[q] / prev[q], 2)} for q in flagged}
    unprobed = [q for q in flagged if q not in probes]
    if unprobed:
        failures.append(
            f"sf100 movers flagged (> {MOVER_RATIO}x vs r11) but NOT "
            f"steady-probed: {unprobed}")

# machine-readable spot-check verdicts — REQUIRED coverage per rung
spots = {}
found_tags = {}
for path in sorted(glob.glob("/tmp/verify_r12_sf*/spot_results.json")):
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
    out["spot_r12"] = spots

# multi-process probes: create-exclusive (occ) and conditional-put (cas)
for name, path in [("occ_multiproc", "/tmp/occ_multiproc_r12.json"),
                   ("cas_multiproc", "/tmp/cas_multiproc_r12.json")]:
    if os.path.exists(path):
        out[name] = json.load(open(path))
    else:
        failures.append(f"missing multi-process probe record {path}")

# discarded rungs leave named triage bundles (r11 VERDICT #5)
bundles = sorted(glob.glob("/tmp/ladder_r12_discarded/*"))
out["discarded_runs"] = [os.path.basename(b) for b in bundles]

# full-gate record (written by the round-close gate run)
gate_path = "/tmp/gate_full_r12.json"
if os.path.exists(gate_path):
    g = json.load(open(gate_path))
    out["gate_full"] = g
    if g.get("fail", 1) != 0:
        failures.append(f"full gate has failures: {g}")
else:
    failures.append("missing full-gate record /tmp/gate_full_r12.json")

if failures:
    print("REFUSING to assemble SCALING_r12.json:", file=sys.stderr)
    for f in failures:
        print("  " + f, file=sys.stderr)
    sys.exit(1)

json.dump(out, open("SCALING_r12.json", "w"), indent=1)
print("SCALING_r12.json written:", list(out.keys()))
