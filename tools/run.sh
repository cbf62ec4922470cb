#!/bin/bash
# Dev aid: run a graft main class with the sbt-built classes + Spark jars
# without paying sbt JVM startup each time.
# Usage: tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/verify_out
set -euo pipefail
cd "$(dirname "$0")/.."
CP="${GRAFT_CLASSES:-target/scala-2.13/classes}:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
# GRAFT_JAVA_OPTS: extra -D flags for per-run engine overrides
# (e.g. GRAFT_JAVA_OPTS="-Dgraft.d19.msigWords=0" for A/B counterfactuals)
exec java $ADD_OPENS ${GRAFT_JAVA_OPTS:-} \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Duser.timezone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" "$@"
