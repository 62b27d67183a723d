#!/bin/bash
# One clean benchmark run with host-condition evidence (VERDICT r09 #4):
#   - /usr/bin/time -v around the bench JVM (user/sys/wall -> a degraded
#     window is provable from the artifact: sys>>user or wall>>cpu means
#     the host, not the plan)
#   - vmstat 5 alongside (the "st" column is hypervisor steal)
# Usage: tools/bench_clean.sh [sfDir] [outPrefix]
# Writes <outPrefix>.json (bench stdout), <outPrefix>.time (time -v),
# <outPrefix>.vmstat. Run it with no other graft JVMs alive.
set -u
SF="${1:-/root/testdata/sf0.1}"
OUT="${2:-/tmp/bench_clean_r10}"
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:$(echo /opt/spark/jars/*.jar | tr ' ' ':')"
vmstat 5 > "$OUT.vmstat" 2>&1 &
VMPID=$!
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_PARTIAL="$OUT.partial.json" \
  /usr/bin/time -v java -Xmx100g -cp "$CP" graft.Bench \
  > "$OUT.json" 2> "$OUT.time"
RC=$?
kill "$VMPID" 2>/dev/null
echo "rc=$RC"
tail -n 3 "$OUT.json"
grep -E "Elapsed|User time|System time|Maximum resident" "$OUT.time" || true
awk 'NR>2 {st+=$17; n++} END {if (n) printf "avg steal %% over run: %.1f (n=%d)\n", st/n, n}' "$OUT.vmstat"
