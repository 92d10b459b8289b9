#!/bin/bash
# Detached full-bench launcher: runs graft.Bench with the JDK17
# --add-opens set on the build's classes + the Spark dist jars.
# Usage: scripts/run_bench.sh [logfile]   (env SPARK_GRAFT_* honored)
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/bench_r4.log}"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -XX:+ExplicitGCInvokesConcurrent -Xmx8g \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench > "$LOG" 2>&1
