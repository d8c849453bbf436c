#!/usr/bin/env python3
"""Assemble SCALING_r11.json from the round-11 evidence (dev tool; run
after the ladder bench JSONs, steady probes, and spot-checks exist).

HARD RULES:
 1. (r9 lesson) A rung containing ANY failed query (-1 in the per-query
    map, or a nonempty `failed` list) REFUSES to assemble.
 2. (r10 lesson, twice relearned before that) MOVER AUTO-FLAGGING with
    the WIDENED threshold: every sf100 query whose wall moved >2.5x vs
    the previous round's rung — whatever its absolute wall — must have
    a steady-probe row, or the builder refuses. r10's hand-picked
    mover set missed five sub-15 s queries with 1.6-4.1x ratios.
 3. (r10 ADVICE) Spot-check verdicts are INGESTED from the
    machine-readable spot_results.json files tools/spot_check.py now
    emits, and gated on — never hand-transcribed literals. Any FAIL
    refuses assembly.
"""
import glob
import json
import os
import re
import sys

MOVER_RATIO = 2.5
PREV = "SCALING_r10.json"

out = {
    "round": 11,
    "note": "Round-11 evidence: the partitioned filtered-ANN arm "
            "(q_knn_filtered_part) and the stream-maintained ANN index "
            "(q_knn_stream) in-suite at every "
            "rung with dial-aware DuckDB spot-checks ingested from "
            "spot_results.json (machine-readable, builder-gated); steady "
            "probes REQUIRED for every >2.5x sf100 mover vs the r10 rung "
            "(widened auto-flag threshold — this builder refuses an "
            "unprobed mover); z-aware live-row bin-pack, KnnIncr epoch "
            "re-index + vacuum safety + streaming maintenance spec-pinned.",
}

# disk fingerprint (hand-measured before attributing any wall move;
# values filled by the round's fingerprint run)
fp_path = "/tmp/disk_fingerprint_r11.json"
if os.path.exists(fp_path):
    out["disk_fingerprint"] = json.load(open(fp_path))
else:
    print("MISSING disk fingerprint /tmp/disk_fingerprint_r11.json",
          file=sys.stderr)
    sys.exit(1)

failures = []

# ladder bench JSONs (full in-suite runs, all declared queries)
for sf, path in [("sf0.1", "/tmp/bench_sf01_r11.json"),
                 ("sf1", "/tmp/bench_sf1_r11.json"),
                 ("sf10", "/tmp/bench_sf10_r11.json"),
                 ("sf100", "/tmp/bench_sf100_r11.json")]:
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

# steady probes: PROBE <query> <dir> first=<s> second=<s> lines
probes = {}
probe_path = "/tmp/probe_sf100_movers_r11.txt"
if os.path.exists(probe_path):
    for line in open(probe_path):
        m = re.match(r"PROBE (\S+) (\S+) first=([\d.]+) second=([\d.]+)", line)
        if m:
            probes[m.group(1)] = {
                "dir": m.group(2), "first_s": float(m.group(3)),
                "steady_s": float(m.group(4))}
if probes:
    out["sf100_mover_steady"] = probes

# WIDENED mover auto-flag: vs the r10 rung, ratio > 2.5x at ANY wall.
# every flagged query must have a steady-probe row or we refuse.
if os.path.exists(PREV) and "queries_sf100" in out:
    prev = json.load(open(PREV)).get("queries_sf100", {})
    cur = out["queries_sf100"]
    flagged = sorted(
        q for q, v in cur.items()
        if q in prev and prev[q] > 0 and v / prev[q] > MOVER_RATIO)
    out["sf100_movers_flagged"] = {
        q: {"r10_s": prev[q], "r11_s": cur[q],
            "ratio": round(cur[q] / prev[q], 2)} for q in flagged}
    unprobed = [q for q in flagged if q not in probes]
    if unprobed:
        failures.append(
            f"sf100 movers flagged (> {MOVER_RATIO}x vs r10) but NOT "
            f"steady-probed: {unprobed}")

# machine-readable spot-check verdicts (spot_results.json per corpus)
spots = {}
for path in sorted(glob.glob("/tmp/verify_r11_sf*/spot_results.json")):
    d = json.load(open(path))
    tag = d["sf_dir"].rstrip("/").split("/")[-1]
    for q, v in d["results"].items():
        spots[f"{q}_{tag}"] = v
        if not v["pass"]:
            failures.append(f"spot-check FAIL: {q} at {d['sf_dir']}")
if spots:
    out["spot_r11"] = spots

# full-gate record (written by the round-close gate run)
gate_path = "/tmp/gate_full_r11.json"
if os.path.exists(gate_path):
    g = json.load(open(gate_path))
    out["gate_full"] = g
    if g.get("fail", 1) != 0:
        failures.append(f"full gate has failures: {g}")

if failures:
    print("REFUSING to assemble SCALING_r11.json:", file=sys.stderr)
    for f in failures:
        print("  " + f, file=sys.stderr)
    sys.exit(1)

json.dump(out, open("SCALING_r11.json", "w"), indent=1)
print("SCALING_r11.json written:", list(out.keys()))
