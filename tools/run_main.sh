#!/bin/bash
# Run a graft main class directly from compiled classes (bypasses sbt for
# fast iteration; compile first via the sbt session). Usage:
#   tools/run_main.sh graft.Explain q3_shipping
OPTS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPTS="$OPTS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPTS="$OPTS --add-opens java.base/$p=ALL-UNNAMED"
done
# 512m code cache: dozens of codegen'd plans churn the default 240m cache;
# when it fills, HotSpot disables the JIT and compute runs interpreted
# (observed: 30x CPU on the decimal aggregation with zero GC).
exec java $OPTS -Xmx${SPARK_DRIVER_MEM:-8g} \
  -XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
