#!/usr/bin/env bash
# Round-11 probe runner: isolated graft.Bench session over a query
# subset at a given sf/replica dir, writing the bench JSON line to
# probes/r11/<out>.json and the full stderr trace next to it.
# Usage: run_probe11.sh <sfDir> <queries-csv> <passes> <outName> [heap] [cpus]
set -euo pipefail
SF="$1"; Q="$2"; PASSES="$3"; OUT="$4"; HEAP="${5:-80g}"; CPUS="${6:-32}"
cd "$(dirname "$0")/.."
mkdir -p probes/r11
OPENS="--add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" \
SPARK_GRAFT_QUERIES="$Q" SPARK_GRAFT_BENCH_PASSES="$PASSES" \
java -Xmx"$HEAP" $OPENS -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
  > "probes/r11/${OUT}.json" 2> "probes/r11/${OUT}.stderr.log"
tail -1 "probes/r11/${OUT}.json"
