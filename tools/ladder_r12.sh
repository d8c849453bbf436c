#!/bin/bash
# Round-12 ladder: fingerprint -> rungs (sf0.1/1/10/100); probes and
# spot-checks run separately. Hardened per the r11 ADVICE + VERDICT:
#  - pipefail + non-empty output check: a crashed Bench aborts AT THE
#    RUNG (r11's `| grep | head` masked the exit status behind set -e).
#  - stderr is CAPTURED per rung, and any failed/empty rung archives a
#    triage bundle under /tmp/ladder_r12_discarded/<rung>-<ts>/ (stderr,
#    partial JSON, disk + memory state) BEFORE the run is discarded —
#    r11's 174-error re-cut vanished with no artifact to diagnose.
set -euo pipefail
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

fingerprint() {
  sync; echo 3 > /proc/sys/vm/drop_caches || true
  t0=$(date +%s.%N)
  cat target/scaledata/sf100/lineitem.parquet/*.parquet > /dev/null
  t1=$(date +%s.%N)
  sz=$(du -sb target/scaledata/sf100/lineitem.parquet | cut -f1)
  cold=$(python3 -c "print(round($sz/1e6/($t1-$t0),1))")
  t2=$(date +%s.%N)
  cat target/scaledata/sf100/lineitem.parquet/*.parquet > /dev/null
  t3=$(date +%s.%N)
  warm=$(python3 -c "print(round($t3-$t2,2))")
  dd if=/dev/zero of=/tmp/ddtest bs=1M count=2048 conv=fdatasync 2> /tmp/ddout
  rm -f /tmp/ddtest
  wr=$(python3 -c "
import re
s=open('/tmp/ddout').read()
m=re.search(r'([\d.]+) (GB|MB)/s', s)
v=float(m.group(1)); print(round(v*1000 if m.group(2)=='GB' else v,1))")
  python3 -c "
import json
json.dump({'cold_read_mb_s': $cold, 'warm_reread_s': $warm,
           'write_mb_s_2gib_fdatasync': $wr,
           'note': 'r11 host was 197/456; r10 228/510; r9 93/276'},
          open('/tmp/disk_fingerprint_r12.json','w'), indent=1)
print(open('/tmp/disk_fingerprint_r12.json').read())"
}

discard_bundle() { # rung-name stderr-file out-file
  ts=$(date +%s)
  d="/tmp/ladder_r12_discarded/$1-$ts"
  mkdir -p "$d"
  cp -f "$2" "$d/stderr.log" 2>/dev/null || true
  cp -f "$3" "$d/partial.json" 2>/dev/null || true
  { df -h /root /tmp; free -m; ls -la target/ | head -30; } > "$d/host_state.txt" 2>&1 || true
  grep -m 40 -E 'Exception|Error|FAILURES' "$2" > "$d/first_errors.txt" 2>/dev/null || true
  echo "DISCARDED rung $1 -> triage bundle at $d" >&2
}

rung() { # sfdir out heap passes
  name=$(basename "$1")
  err="/tmp/bench_${name}_r12.stderr"
  echo "=== rung $1 start $(date +%T)"
  # capture ALL metric lines (Bench prints the record twice), then take
  # the first — `grep | head -1` under pipefail would SIGPIPE the
  # producer when head exits early and read success as failure
  if ! SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_BENCH_PASSES="$4" \
      java -Xmx"$3" $JOPTS -cp "$CP" graft.Bench 2>"$err" \
      | grep '"metric"' > "$2.all"; then
    discard_bundle "$name" "$err" "$2.all"
    echo "rung $1 FAILED (nonzero Bench exit or no metric line)" >&2
    exit 1
  fi
  head -1 "$2.all" > "$2"
  if ! [ -s "$2" ]; then
    discard_bundle "$name" "$err" "$2"
    echo "rung $1 FAILED (empty output)" >&2
    exit 1
  fi
  echo "=== rung $1 done $(date +%T)"
  python3 -c "
import json; d=json.load(open('$2'))
print('total', d['value'], 'n', len(d['queries']), 'failed', d.get('n_failed'), 'fp', d.get('fp'))"
}

case "${1:-all}" in
  fp) fingerprint ;;
  sf01)  rung /root/testdata/sf0.1 /tmp/bench_sf01_r12.json 48g 2 ;;
  sf1)   rung target/scaledata/sf1 /tmp/bench_sf1_r12.json 48g 2 ;;
  sf10)  rung target/scaledata/sf10 /tmp/bench_sf10_r12.json 48g 2 ;;
  # 80g (r11 ran 64g): the suite gained two corpus-sized standing
  # lineages this round (q_knn_stream's live-maintained table and
  # q_knn_part_incr's maintained partition index + serve artifacts, all
  # resident at 2M vectors) and the first 64g cut died exactly like
  # r11's mystery re-cut — executor OOM → dead context → mass instant
  # errors (triage bundle sf100-1786896967 finally names the mode)
  sf100) rm -rf target/graft_* spark-warehouse /tmp/blockmgr-* /tmp/spark-* ; rung target/scaledata/sf100 /tmp/bench_sf100_r12.json 80g 1 ;;
esac
