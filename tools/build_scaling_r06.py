#!/usr/bin/env python3
"""Assemble SCALING_r06.json from the round-6 evidence (dev tool; run
after the bench ladder JSONs and probe transcripts exist in /tmp)."""
import json
import os
import re
import sys

out = {
    "round": 6,
    "note": "Round-6 evidence: kNN probe rewritten to an index-resident "
            "leaf-key join (no driver-collected InSet), real Y4M video codec "
            "(q_video_frames pixel-sum oracle), ledger time travel "
            "(q_time_travel), WindowGroupLimit pinned, bench releases "
            "standing state between passes (64g sf100 target), 12M-key "
            "streaming-state curve, spill-tier dial study.",
}

# streaming-state curve: parsed from the ProbeStreamState transcript
streams = {}
probe = "/tmp/probe_stream_state_r6.txt"
if os.path.exists(probe):
    for line in open(probe):
        m = re.match(
            r"(dedup_first|last_event_ttl) (cohort\s+\d+|drained\s*): "
            r"state_rows=\s*(\d+) state_mib=\s*([\d.]+) latency_s=\s*([\d.]+)",
            line)
        if m:
            op, tag, rows, mib, sec = m.groups()
            streams.setdefault(op, []).append(
                {"cohort": tag.strip(), "state_rows": int(rows),
                 "state_mib": float(mib), "latency_s": float(sec)})
    out["stream_state_12m"] = streams

# spot-checks (filled in manually from spot_check.py runs)
spot = "/tmp/spot_r6.json"
if os.path.exists(spot):
    out.update(json.load(open(spot)))

# spill study (manual record)
spill = "/tmp/spill_study_r6.json"
if os.path.exists(spill):
    out["spill_study"] = json.load(open(spill))

for sf, path in [("sf0.1", "/tmp/bench_sf01_r6.json"),
                 ("sf1", "/tmp/bench_sf1_r6.json"),
                 ("sf10", "/tmp/bench_sf10_r6.json"),
                 ("sf100", "/tmp/bench_sf100_r6.json")]:
    if not os.path.exists(path):
        continue
    d = json.load(open(path))
    key = sf.replace(".", "")
    out[f"{key}_total_sec"] = d["value"]
    out[f"n_queries_{key}"] = len(d["queries"])
    out[f"queries_{key}"] = d["queries"]

json.dump(out, open("SCALING_r06.json", "w"), indent=1)
print("wrote SCALING_r06.json:",
      {k: out[k] for k in out if k.endswith("_total_sec")},
      "streams:", {k: len(v) for k, v in streams.items()})
