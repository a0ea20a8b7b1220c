#!/usr/bin/env bash
# Round-11 core-scaling grid (r10 verdict task 6): run each query against
# the 64x replica at 32 and at 8 cores, single pass, no warmup — the
# per-query 32c/8c wall ratio is the scaling evidence sf0.1 cannot give
# (there 8 cores beats 32 because every query is overhead-bound).
# Usage: scale_grid11.sh <replicaDir> <queries-csv> [outPrefix]
set -euo pipefail
SF="$1"; QS="$2"; PREFIX="${3:-grid64}"
cd "$(dirname "$0")/.."
mkdir -p probes/r11
OPENS="--add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
IFS=',' read -ra ARR <<< "$QS"
for q in "${ARR[@]}"; do
  for cpus in 32 8; do
    SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$cpus" SPARK_GRAFT_QUERIES="$q" \
    SPARK_GRAFT_BENCH_PASSES=1 SPARK_GRAFT_BENCH_WARMUP=0 \
    java -Xmx80g $OPENS -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
      > "probes/r11/${PREFIX}_${q}_c${cpus}.json" 2> "probes/r11/${PREFIX}_${q}_c${cpus}.stderr.log" || \
      echo "[grid] $q c$cpus FAILED"
    tail -c 200 "probes/r11/${PREFIX}_${q}_c${cpus}.json"; echo
  done
done
