#!/bin/bash
# Round-10 corpus regen (restart wiped target/scaledata again).
# Ladder rungs only: sf1 / sf10 / sf100. Deterministic (ScaleGen seeded).
set -eu
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
SRC=/root/testdata/sf0.1
OUT=/root/repo/target/scaledata
gen() { # name args...
  name=$1; shift
  echo "=== $name start $(date +%T)"
  java -Xmx48g $JOPTS -cp "$CP" graft.ScaleGen "$@" 2>&1 | grep -v WARN || true
  echo "=== $name done $(date +%T)"
}
gen sf1    "$SRC" "$OUT/sf1"    10
gen sf10   "$SRC" "$OUT/sf10"   100
gen sf100  "$SRC" "$OUT/sf100"  1000
echo ALL_DONE
