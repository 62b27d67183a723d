#!/bin/bash
# One clean benchmark run with host-condition evidence (VERDICT r09 #4):
#   - bash `time` around the bench JVM (user/sys/wall — sys>>user or
#     wall>>cpu proves the host, not the plan; /usr/bin/time is absent
#     in this container)
#   - /proc/stat steal-tick delta + vmstat 5 alongside (hypervisor steal)
# Usage: tools/bench_clean.sh [sfDir] [outPrefix]
# Writes <outPrefix>.json (bench stdout), <outPrefix>.time (time + steal),
# <outPrefix>.vmstat. Run it with no other graft JVMs alive.
set -u
SF="${1:-/root/testdata/sf0.1}"
OUT="${2:-/tmp/bench_clean_r10}"
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:$(echo /opt/spark/jars/*.jar | tr ' ' ':')"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
vmstat 5 > "$OUT.vmstat" 2>&1 &
VMPID=$!
steal0=$(awk '/^cpu /{print $9}' /proc/stat)
total0=$(awk '/^cpu /{s=0; for(i=2;i<=NF;i++) s+=$i; print s}' /proc/stat)
TIMEFORMAT='real %3R user %3U sys %3S'
# -Xmx8g + UTC: the SAME JVM the sbt gate forks (build.sbt javaOptions).
# r13 finding: the script's old -Xmx100g heap measured 15-25% SLOWER
# query-sums with 2-4x the sys time and pathological single-query
# outliers (s9 29 s, s6 12 s) — first-touch page faults and huge-heap
# GC geometry, not the plans. Benchmark the heap the gate actually uses.
{ time SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_PARTIAL="$OUT.partial.json" \
    java -Xmx"${SPARK_DRIVER_MEM:-8g}" $ADD_OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Bench \
    > "$OUT.json" 2> "$OUT.benchlog" ; } 2> "$OUT.time"
RC=$?
steal1=$(awk '/^cpu /{print $9}' /proc/stat)
total1=$(awk '/^cpu /{s=0; for(i=2;i<=NF;i++) s+=$i; print s}' /proc/stat)
kill "$VMPID" 2>/dev/null
echo "steal ticks $((steal1 - steal0)) of $((total1 - total0)) total ($(awk -v s=$((steal1-steal0)) -v t=$((total1-total0)) 'BEGIN{printf "%.1f", 100*s/t}')%)" >> "$OUT.time"
echo "rc=$RC"
cat "$OUT.time"
tail -c 600 "$OUT.json"
