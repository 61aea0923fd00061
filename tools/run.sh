#!/usr/bin/env bash
# Direct-JVM launcher for graft mains (graft.Bench, graft.Scale, ...):
# replicates build.sbt's fork settings (JDK17 add-opens + UTC + heap)
# without taking sbt's project lock, so benches can run while sbt is busy.
# Usage: tools/run.sh graft.Bench [args...]   (compile first: sbt compile)
set -euo pipefail
cd "$(dirname "$0")/.."
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS "-Xmx${SPARK_DRIVER_MEM:-8g}" -XX:+UseParallelGC \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
