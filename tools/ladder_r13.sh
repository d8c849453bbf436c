#!/bin/bash
# Round-13 ladder: fingerprint -> rungs (sf0.1/1/10/100); probes and
# spot-checks run separately. Carries the r12 hardening (pipefail,
# non-empty rung check, triage bundles) plus the r12 VERDICT items:
#  - victim.txt in every triage bundle: the last `[bench] <q> start`
#    stderr marker names the query a dead-context cascade started at
#    (r12 VERDICT #5 — saves the cross-file join next time).
#  - sf100 posture: the r12 in-suite executor OOM (q_tpch5: 26 tasks
#    each refusing 512MB-1GiB execution pages at 80g/local[32]) is a
#    CONCURRENCY problem — the binding constraint is peak simultaneous
#    execution-page demand, not the heap alone. The rung now runs
#    local[16] (halves concurrent demand) with SPARK_GRAFT_SHUFFLE=32
#    (per-partition data stays the tested size; only simultaneous
#    residency drops — the fewer-fatter-executors knob) at 100g heap
#    (the host has 125 GiB; nothing else runs during the rung).
#  - SPARK_GRAFT_FP_DROP=1: the Bench-embedded fingerprint's read leg
#    measures COLD reads in ladder runs (the page-cache drop is opt-in
#    now — a casual bench run must not evict the whole host's cache).
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
           'note': 'r12 host was ~190 read; r11 197/456; r10 228/510; r9 93/276'},
          open('/tmp/disk_fingerprint_r13.json','w'), indent=1)
print(open('/tmp/disk_fingerprint_r13.json').read())"
}

discard_bundle() { # rung-name stderr-file out-file
  ts=$(date +%s)
  d="/tmp/ladder_r13_discarded/$1-$ts"
  mkdir -p "$d"
  cp -f "$2" "$d/stderr.log" 2>/dev/null || true
  cp -f "$3" "$d/partial.json" 2>/dev/null || true
  { df -h /root /tmp; free -m; ls -la target/ | head -30; } > "$d/host_state.txt" 2>&1 || true
  grep -m 40 -E 'Exception|Error|FAILURES' "$2" > "$d/first_errors.txt" 2>/dev/null || true
  # the victim: the last query the bench STARTED before stderr went bad
  # (r12 VERDICT #5 — the [bench] marker is what names it; first_errors
  # alone can't, map iteration order != suite order)
  grep '\[bench\]' "$2" 2>/dev/null | tail -1 > "$d/victim.txt" || true
  echo "DISCARDED rung $1 -> triage bundle at $d" >&2
}

rung() { # sfdir out heap passes cpus shuffle
  name=$(basename "$1")
  err="/tmp/bench_${name}_r13.stderr"
  echo "=== rung $1 start $(date +%T) (heap=$3 passes=$4 cpus=$5 shuffle=$6)"
  # capture ALL metric lines (Bench prints the record twice), then take
  # the first — `grep | head -1` under pipefail would SIGPIPE the
  # producer when head exits early and read success as failure
  if ! SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_BENCH_PASSES="$4" \
      SPARK_GRAFT_CPUS="$5" SPARK_GRAFT_SHUFFLE="$6" SPARK_GRAFT_FP_DROP=1 \
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
  sf01)  rung /root/testdata/sf0.1 /tmp/bench_sf01_r13.json 48g 2 32 32 ;;
  sf1)   rung target/scaledata/sf1 /tmp/bench_sf1_r13.json 48g 2 32 32 ;;
  sf10)  rung target/scaledata/sf10 /tmp/bench_sf10_r13.json 48g 2 32 32 ;;
  sf100) rm -rf target/graft_* spark-warehouse /tmp/blockmgr-* /tmp/spark-* ; rung target/scaledata/sf100 /tmp/bench_sf100_r13.json 100g 1 16 32 ;;
esac
