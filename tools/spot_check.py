#!/usr/bin/env python3
"""Scaled-corpus oracle spot-check harness (dev tool).

Runs the DuckDB compare on a ScaleGen corpus for a named subset of
queries, after patching the dial-aware q_knn_join oracle SQL (the
static oracle_sql.json entry carries the flat 4-plane gate chain; above
oracle scale the Spark side switches to the occupancy-adaptive trie, so
the SQL must be regenerated for the corpus' embedding count via
graft.SpotOracle). q_knn_filtered_part dials on the label=7 PARTITION
count instead of the corpus count.

Emits a machine-readable verdict file <outDir>/spot_results.json
({query: {"pass": bool, "rows": int}}) so the SCALING builder can
ingest and GATE on spot-check results instead of trusting
hand-transcribed literals.

Usage:
  python3 tools/spot_check.py <sfDir> <outDir> [query ...]

Prereqs: graft.Verify has populated <outDir> for the same corpus, and
target/scala-2.13/classes is compiled (SpotOracle runs via java -cp).
"""
import glob
import json
import os
import re
import subprocess
import sys

JOPTS = [
    "--add-exports", "java.base/sun.nio.ch=ALL-UNNAMED",
    "--add-opens", "java.base/java.nio=ALL-UNNAMED",
    "--add-opens", "java.base/java.util=ALL-UNNAMED",
    "--add-opens", "java.base/java.lang=ALL-UNNAMED",
    "--add-opens", "java.base/java.lang.invoke=ALL-UNNAMED",
    "--add-opens", "java.base/sun.util.calendar=ALL-UNNAMED",
    "--add-opens", "java.base/java.util.concurrent=ALL-UNNAMED",
    "--add-opens", "java.base/sun.security.action=ALL-UNNAMED",
]
CP = "target/scala-2.13/classes:/opt/spark/jars/*"


def count_embeddings(sf_dir, label=None):
    import pyarrow.parquet as pq
    path = os.path.join(sf_dir, "embeddings.parquet")
    files = glob.glob(os.path.join(path, "*.parquet")) if os.path.isdir(path) else [path]
    if label is None:
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    n = 0
    for f in files:
        t = pq.read_table(f, columns=["label"])
        n += sum(c == label for c in t.column("label").to_pylist())
    return n


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    queries = sys.argv[3:]
    oracle_path = os.path.join(out_dir, "oracle_sql.json")
    oracle = json.load(open(oracle_path))
    dialed = {"q_knn_join": "1", "q_knn_join_mp": "2",
              "q_knn_filtered": "filtered", "q_knn_incr": "incr",
              "q_knn_stream": "incr",
              "q_knn_filtered_part": "filtered_part",
              # dialed on the BOOTSTRAP partition count (label-7 at v0
              # = the raw corpus' label-7 count)
              "q_knn_part_incr": "part_incr"}
    # q_knn_routed is fixture-backed (static SQL at every scale): no patch
    part_dialed = {"q_knn_filtered_part", "q_knn_part_incr"}
    patch = [q for q in dialed if not queries or q in queries]
    if patch:
        n = count_embeddings(sf_dir)
        n7 = count_embeddings(sf_dir, label=7) \
            if any(q in part_dialed for q in patch) else None
        for q in patch:
            dial_n = n7 if q in part_dialed else n
            sql = subprocess.run(
                ["java", *JOPTS, "-cp", CP, "graft.SpotOracle",
                 str(dial_n), dialed[q]],
                capture_output=True, text=True, check=True).stdout.strip()
            oracle[q] = sql
        json.dump(oracle, open(oracle_path, "w"))
        print(f"patched {patch} oracle for n={n}" +
              (f" (partition n={n7})" if n7 is not None else ""))
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "oracle_check.py"),
         sf_dir, out_dir, *queries], capture_output=True, text=True)
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)
    # machine-readable verdicts for the SCALING builder to ingest+gate on
    results = {}
    for line in proc.stdout.splitlines():
        m = re.match(r"PASS (\S+) \((\d+) rows\)", line)
        if m:
            results[m.group(1)] = {"pass": True, "rows": int(m.group(2))}
            continue
        m = re.match(r"FAIL (\S+)", line)
        if m:
            results[m.group(1).rstrip(":")] = {"pass": False, "rows": -1}
    with open(os.path.join(out_dir, "spot_results.json"), "w") as f:
        json.dump({"sf_dir": sf_dir, "results": results}, f, indent=1)
    print(f"wrote {os.path.join(out_dir, 'spot_results.json')}")
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
