#!/bin/bash
# Dev-only: run graft.Bench from a frozen classes snapshot so sbt
# compiles can proceed concurrently. Replicates build.sbt javaOptions.
set -e
SNAP=${SNAP:-/tmp/graft_classes_snap}
rm -rf "$SNAP"; cp -r /root/repo/target/scala-2.13/classes "$SNAP"
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
ADDOPENS="$ADDOPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED"
ADDOPENS="$ADDOPENS --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
exec java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} \
  -cp "$SNAP:/opt/spark/jars/*" "$@"
