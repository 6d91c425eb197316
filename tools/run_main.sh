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
# Clamp the heap to 31g (compressed-oops boundary): a 95g-heap run was
# measured executing codegen kernels interpreted (85x CPU, zero GC).
MEM="${SPARK_DRIVER_MEM:-8g}"
case "$MEM" in
  *[gG]) N="${MEM%[gG]}"; case "$N" in *[!0-9]*) MEM=8g;; *) [ "$N" -gt 31 ] && MEM=31g;; esac ;;
  *[mM]) N="${MEM%[mM]}"; case "$N" in *[!0-9]*) MEM=8g;; *) [ "$N" -gt 31744 ] && MEM=31g;; esac ;;
esac
exec java $OPTS -Xmx$MEM \
  -XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
