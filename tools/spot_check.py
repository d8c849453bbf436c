#!/usr/bin/env python3
"""Scaled-corpus oracle spot-check harness (dev tool).

Runs the DuckDB compare on a ScaleGen corpus for a named subset of
queries, after patching the dial-aware q_knn_join oracle SQL (the
static oracle_sql.json entry carries the flat 4-plane gate chain; above
oracle scale the Spark side switches to the occupancy-adaptive trie, so
the SQL must be regenerated for the corpus' embedding count via
graft.SpotOracle).

Usage:
  python3 tools/spot_check.py <sfDir> <outDir> [query ...]

Prereqs: graft.Verify has populated <outDir> for the same corpus, and
target/scala-2.13/classes is compiled (SpotOracle runs via java -cp).
"""
import glob
import json
import os
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


def count_embeddings(sf_dir):
    import pyarrow.parquet as pq
    path = os.path.join(sf_dir, "embeddings.parquet")
    files = glob.glob(os.path.join(path, "*.parquet")) if os.path.isdir(path) else [path]
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    queries = sys.argv[3:]
    oracle_path = os.path.join(out_dir, "oracle_sql.json")
    oracle = json.load(open(oracle_path))
    dialed = {"q_knn_join": "1", "q_knn_join_mp": "2",
              "q_knn_filtered": "filtered", "q_knn_incr": "incr"}
    patch = [q for q in dialed if not queries or q in queries]
    if patch:
        n = count_embeddings(sf_dir)
        for q in patch:
            sql = subprocess.run(
                ["java", *JOPTS, "-cp", CP, "graft.SpotOracle", str(n), dialed[q]],
                capture_output=True, text=True, check=True).stdout.strip()
            oracle[q] = sql
        json.dump(oracle, open(oracle_path, "w"))
        print(f"patched {patch} oracle for n={n}")
    rc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "oracle_check.py"),
         sf_dir, out_dir, *queries]).returncode
    sys.exit(rc)


if __name__ == "__main__":
    main()
