#!/usr/bin/env bash
# Dev-only probe runner: isolated graft.Bench session over a query
# subset at a given sf/replica dir, writing the bench JSON line to
# probes/<out>.json and the full stderr trace next to it.
# Usage: run_probe.sh <sfDir> <queries-csv> <passes> <outName> [heap]
set -euo pipefail
SF="$1"; Q="$2"; PASSES="$3"; OUT="$4"; HEAP="${5:-80g}"
cd "$(dirname "$0")/.."
mkdir -p probes/r10
# Spark 4's required module opens (JavaModuleOptions) — sbt adds these
# itself; a plain `java` runner must pass them or date/time codegen
# fails reflective access (sun.util.calendar.ZoneInfo).
OPENS="--add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_QUERIES="$Q" SPARK_GRAFT_BENCH_PASSES="$PASSES" \
java -Xmx"$HEAP" $OPENS -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
  > "probes/r10/${OUT}.json" 2> "probes/r10/${OUT}.stderr.log"
tail -1 "probes/r10/${OUT}.json"
