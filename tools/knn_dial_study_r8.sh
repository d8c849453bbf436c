#!/bin/bash
# Clustered-corpus ANN recall-vs-cost curve (r8 judge item 3): run
# ProbeKnnDiag's answer-level recall verification across the
# multi-probe / cap dials on a clustered ScaleGen corpus.
# Usage: knn_dial_study_r8.sh <corpusDir> <sampleMod> <outFile>
set -u
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
JOPTS="--add-exports java.base/sun.nio.ch=ALL-UNNAMED \
 --add-opens java.base/java.nio=ALL-UNNAMED \
 --add-opens java.base/java.util=ALL-UNNAMED \
 --add-opens java.base/java.lang=ALL-UNNAMED \
 --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
 --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
 --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
 --add-opens java.base/sun.security.action=ALL-UNNAMED"
DIR=$1; MOD=$2; OUT=$3
: > "$OUT"
run() { # label extra-jvm-flags
  echo "== dial: $1" >> "$OUT"
  # shellcheck disable=SC2086
  java -Xmx56g $JOPTS $2 -cp "$CP" graft.ProbeKnnDiag "$DIR" "$MOD" recall \
    2>/dev/null | grep -E "^(n=|recall@3|edge exactness|qKnnJoin)" >> "$OUT"
}
run "default (P=1)"     ""
run "P=2"               "-Dgraft.knn.probes=2"
run "P=4"               "-Dgraft.knn.probes=4"
run "P=8"               "-Dgraft.knn.probes=8"
run "P=4 + cap=1000"    "-Dgraft.knn.probes=4 -Dgraft.knn.cap=1000"
echo DONE >> "$OUT"
