#!/usr/bin/env python3
"""Assemble SCALING_r07.json from the round-7 evidence (dev tool; run
after the probe transcripts, spot-check JSONs, and ladder bench JSONs
exist in /tmp)."""
import json
import os
import re

out = {
    "round": 7,
    "note": "Round-7 evidence: ledger CDF as a Structured Streaming source "
            "(q_ledger_stream), z-order layout unified into the ledger "
            "(q_ledger_zorder, both-dim manifest stats), IMA ADPCM audio "
            "(q_audio_adpcm), OCC behind a LogStore trait + 8-writer "
            "contention stress, standing artifacts warmup-built (bench "
            "attribution fix), kNN answer-level sf100 verification "
            "(recall + edge exactness vs brute force), streaming-state "
            "crash recovery at the 10M-key horizon.",
}

# streaming-state curve + recovery: the ProbeStreamState transcript
streams = {}
probe = "/tmp/probe_stream_state_r7.txt"
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
        r = re.match(
            r"recovery: rows_before=\s*(\d+) \(\s*([\d.]+) MiB\) "
            r"rows_after=\s*(\d+) \(\s*([\d.]+) MiB\) recover_s=\s*([\d.]+)",
            line)
        if r:
            rb, mb, ra, ma, s = r.groups()
            out["stream_recovery_10m"] = {
                "rows_before_kill": int(rb), "mib_before": float(mb),
                "rows_after_restore": int(ra), "mib_after": float(ma),
                "recover_s": float(s),
                "protocol": "checkpointed dedupFirst, 8x1.25M cohorts, one "
                            "cohort left in flight, query killed, restarted "
                            "from checkpoint; rows_after includes the "
                            "replayed cohort minus the watermark-expired one"}
    if streams:
        out["stream_state_10m_r7"] = streams

# kNN sf100 answer-level verification: ProbeKnnDiag recall transcript
knn = "/tmp/knn_sf100_r7.txt"
if os.path.exists(knn):
    rec = {}
    for line in open(knn):
        m = re.search(r"n=(\d+) dial p0=(\d+) maxD=(\d+)", line)
        if m:
            rec["n_vectors"] = int(m.group(1))
            rec["dial_p0"] = int(m.group(2))
            rec["dial_maxD"] = int(m.group(3))
        m = re.search(r"recall@3 over (\d+) queries = ([\d.]+) t=([\d.]+)", line)
        if m:
            rec["n_queries"] = int(m.group(1))
            rec["recall_at_3"] = float(m.group(2))
            rec["exact_check_s"] = float(m.group(3))
        m = re.search(
            r"edge exactness: (\d+) edges rechecked, (\d+) sim mismatches, "
            r"(\d+) dangling endpoints t=([\d.]+)", line)
        if m:
            rec["edges_rechecked"] = int(m.group(1))
            rec["sim_mismatches"] = int(m.group(2))
            rec["dangling_endpoints"] = int(m.group(3))
            rec["edge_check_s"] = float(m.group(4))
    if rec:
        rec["protocol"] = ("deterministic hash(q_id) mod M sample, brute-force "
                           "exact top-3 over the full corpus (broadcast "
                           "queries, one cosine pass), plus independent "
                           "recomputation of every reported edge's cosine")
        if "recall_at_3" in rec and "n_vectors" in rec:
            # random-chance baseline: P(an exact top-3 member is among
            # the ~2*cap candidates an occupancy-capped leaf examines).
            # cap=250 is the default dial (VectorOps.KnnCapOcc); a probe
            # run with -Dgraft.knn.cap overridden invalidates this
            # baseline — recompute with the overridden cap.
            rec["assumed_cap"] = 250
            chance = 2.0 * rec["assumed_cap"] / rec["n_vectors"]
            rec["recall_chance_baseline"] = round(chance, 6)
            rec["recall_lift_vs_chance"] = round(rec["recall_at_3"] / chance, 1)
            rec["note"] = ("absolute recall is structural to this corpus's "
                           "near-random geometry (PERF.md r5) and falls with "
                           "n at fixed dial; the lift over the random-chance "
                           "candidate baseline is the dial's real signal, "
                           "and edge exactness (0 mismatches) is the "
                           "answer-level correctness check")
        out["knn_sf100_answer_check"] = rec

# sf10/sf1 spot-checks and probes (spot_check.py / ProbeScale runs)
for tag, path in [("spot_sf10_r7", "/tmp/spot_sf10_r7.json"),
                  ("queries_r7_probe", "/tmp/probe_r7_queries.json")]:
    if os.path.exists(path):
        out[tag] = json.load(open(path))

# ladder bench JSONs. sf10 prefers the re-run: the first sf10 pass ran
# while the disk was near-full (the first sf100 attempt died on space),
# inflating every IO-heavy query ~uniformly +50% (394 s); the clean
# re-run landed at 286 s with per-query times back in line with r6.
sf10 = ("/tmp/bench_sf10_r7b.json"
        if os.path.exists("/tmp/bench_sf10_r7b.json")
        else "/tmp/bench_sf10_r7.json")
# sf0.1 prefers the session-2 final run: 187 queries (adds
# q_ledger_replicate), 70.7 s with the ledger family at 7.8 s
sf01 = ("/tmp/bench_sf01_r7c.json"
        if os.path.exists("/tmp/bench_sf01_r7c.json")
        else "/tmp/bench_sf01_r7.json")
# sf1 likewise prefers the clean re-run (114.4 s vs the contended 135.3)
sf1 = ("/tmp/bench_sf1_r7b.json"
       if os.path.exists("/tmp/bench_sf1_r7b.json")
       else "/tmp/bench_sf1_r7.json")
for sf, path in [("sf0.1", sf01),
                 ("sf1", sf1),
                 ("sf10", sf10),
                 ("sf100", "/tmp/bench_sf100_r7.json")]:
    if not os.path.exists(path):
        continue
    d = json.load(open(path))
    key = sf.replace(".", "")
    out[f"{key}_total_sec"] = d["value"]
    # the driver-parsed compact record carries only the slowest-10 map
    # plus the true count in n_queries; the full SPARK_GRAFT_BENCH_OUT
    # file carries every query. Prefer the declared count either way.
    out[f"n_queries_{key}"] = d.get("n_queries", len(d["queries"]))
    out[f"queries_{key}"] = d["queries"]

json.dump(out, open("SCALING_r07.json", "w"), indent=1)
print("wrote SCALING_r07.json:",
      {k: out[k] for k in out if k.endswith("_total_sec")},
      "| knn:", out.get("knn_sf100_answer_check", {}).get("recall_at_3"),
      "| recovery:", out.get("stream_recovery_10m", {}).get("recover_s"))
