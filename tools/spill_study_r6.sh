#!/bin/bash
# Spill-tier dial study (r6, VERDICT item 9): run the sf100 TPC-H
# composites with spark.local.dir on the one disk vs tmpfs (/dev/shm —
# RAM-speed shuffle, the cluster-bandwidth proxy), at 32 vs 256 shuffle
# partitions. Fresh JVM per cell (local.dir is fixed at context start).
# Appends ProbeSpill's SPILL lines to /tmp/spill_study_r6.txt.
set -u
CP="target/scala-2.13/classes:/opt/spark/jars/*"
JOPTS="--add-exports java.base/sun.nio.ch=ALL-UNNAMED \
 --add-opens java.base/java.nio=ALL-UNNAMED \
 --add-opens java.base/java.util=ALL-UNNAMED \
 --add-opens java.base/java.lang=ALL-UNNAMED \
 --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
 --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
 --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
 --add-opens java.base/sun.security.action=ALL-UNNAMED"
OUT=/tmp/spill_study_r6.txt
SF=/root/repo/target/scaledata/sf100
cell() { # dir parts queries
  mkdir -p "$1"
  java -Xmx56g $JOPTS -cp "$CP" graft.ProbeSpill "$1" "$2" "$3" "$SF" \
    2>/dev/null | grep '^SPILL' | tee -a "$OUT"
  rm -rf "$1"
}
: > "$OUT"
cell /root/repo/target/spill_disk 32  q_tpch18,q_tpch2,q_tpch8
cell /dev/shm/graft_spill         32  q_tpch18,q_tpch2,q_tpch8
cell /root/repo/target/spill_disk 256 q_tpch18
cell /dev/shm/graft_spill         256 q_tpch18
echo DONE >> "$OUT"
