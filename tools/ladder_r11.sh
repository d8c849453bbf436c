#!/bin/bash
# Round-11 ladder: fingerprint -> rungs (sf0.1/1/10/100) -> probes are
# run separately. Bench exits nonzero on any failed query; each rung's
# JSON lands in /tmp for tools/build_scaling_r11.py (which refuses
# failures and unprobed movers).
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
           'note': 'r10 host was 228/510; r9 was 93/276'},
          open('/tmp/disk_fingerprint_r11.json','w'), indent=1)
print(open('/tmp/disk_fingerprint_r11.json').read())"
}

rung() { # sfdir out heap passes
  echo "=== rung $1 start $(date +%T)"
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_BENCH_PASSES="$4" \
    java -Xmx"$3" $JOPTS -cp "$CP" graft.Bench 2>/dev/null | grep '"metric"' | head -1 > "$2"
  echo "=== rung $1 done $(date +%T)"
  python3 -c "
import json; d=json.load(open('$2'))
print('total', d['value'], 'n', len(d['queries']), 'failed', d.get('n_failed'))"
}

case "${1:-all}" in
  fp) fingerprint ;;
  sf01)  rung /root/testdata/sf0.1 /tmp/bench_sf01_r11.json 48g 2 ;;
  sf1)   rung target/scaledata/sf1 /tmp/bench_sf1_r11.json 48g 2 ;;
  sf10)  rung target/scaledata/sf10 /tmp/bench_sf10_r11.json 48g 2 ;;
  sf100) rm -rf target/graft_* spark-warehouse /tmp/blockmgr-* /tmp/spark-* ; rung target/scaledata/sf100 /tmp/bench_sf100_r11.json 64g 1 ;;
esac
