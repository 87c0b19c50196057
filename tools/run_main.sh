#!/usr/bin/env bash
# Run a graft main class directly on the compiled classes — no sbt lock, so
# long sweeps (sf1 verify/bench) can run while sbt keeps building/testing.
# Usage: tools/run_main.sh <mainClass> [args...]
#   env: SPARK_DRIVER_MEM (default 8g), plus whatever the main reads.
# Requires `sbt compile` to have produced target/scala-2.13/classes.
#   env: GRAFT_CLASSES overrides the classes dir — point it at a frozen
#   `cp -a` snapshot for long background runs, so a concurrent `sbt
#   compile` can't swap class files under a lazily-loading JVM.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CP="${GRAFT_CLASSES:-$REPO/target/scala-2.13/classes}:$(ls /opt/spark/jars/*.jar | paste -sd:)"
ADD_OPENS=(
  java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect
  java.base/java.io java.base/java.net java.base/java.nio java.base/java.util
  java.base/java.util.concurrent java.base/java.util.concurrent.atomic
  java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action
  java.base/sun.util.calendar
)
OPENS=()
for p in "${ADD_OPENS[@]}"; do OPENS+=(--add-opens "$p=ALL-UNNAMED"); done
exec java "${OPENS[@]}" \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$@"
