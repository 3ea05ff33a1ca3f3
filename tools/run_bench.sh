#!/usr/bin/env bash
# Run graft.Bench (or another graft main) outside sbt with the same JVM
# setup build.sbt gives forked runs: the JDK-17 add-opens Spark needs
# (without java.base/java.nio open, Kryo cannot serialize ByteBuffer —
# q91/q92's PQ codebooks fail), UTC session time, no UI, 8g heap.
#
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run_bench.sh [MainClass args...]
#
# Default main: graft.Bench. Requires target/scala-2.13/classes to be
# current (`sbt compile`).
set -euo pipefail
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
MAIN="${1:-graft.Bench}"
shift || true
OPENS=(java.base/java.lang java.base/java.lang.invoke
  java.base/java.lang.reflect java.base/java.io java.base/java.net
  java.base/java.nio java.base/java.util java.base/java.util.concurrent
  java.base/java.util.concurrent.atomic java.base/sun.nio.ch
  java.base/sun.nio.cs java.base/sun.security.action
  java.base/sun.util.calendar)
FLAGS=()
for p in "${OPENS[@]}"; do FLAGS+=(--add-opens "$p=ALL-UNNAMED"); done
exec java "${FLAGS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-8g}" \
  -cp "$ROOT/target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
