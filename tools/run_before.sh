#!/usr/bin/env bash
# run_main.sh against the BEFORE-code class snapshot (/tmp/classes_before,
# taken from HEAD at round start) — used to print `plans/r19/*_before.txt`
# while the working tree moves on. Measurement/plan capture only.
set -euo pipefail
cd "$(dirname "$0")/.."
CLASSES=/tmp/classes_before
[ -d "$CLASSES" ] || { echo "no before snapshot at $CLASSES" >&2; exit 1; }
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
