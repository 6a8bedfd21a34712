#!/usr/bin/env bash
# Direct-java runner for graft mains — skips sbt startup (~20 s) and the
# sbt build lock, so measurement runs can overlap an sbt test/gate run.
# Classes must already be compiled (sbt compile); this does NOT compile.
# Usage: tools/run_main.sh graft.Bench [args...]
#   env: SPARK_DRIVER_MEM (default 8g) + whatever the main reads.
set -euo pipefail
cd "$(dirname "$0")/.."
CLASSES=target/scala-2.13/classes
[ -d "$CLASSES" ] || { echo "run 'sbt compile' first" >&2; exit 1; }
ADD_OPENS=()
for p in java.base/java.lang java.base/java.lang.invoke \
    java.base/java.lang.reflect java.base/java.io java.base/java.net \
    java.base/java.nio java.base/java.util \
    java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
    java.base/sun.nio.ch java.base/sun.nio.cs \
    java.base/sun.security.action java.base/sun.util.calendar; do
  ADD_OPENS+=(--add-opens "$p=ALL-UNNAMED")
done
exec java "${ADD_OPENS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
