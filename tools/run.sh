#!/bin/bash
# Fast dev loop: package once, run a main class against /opt/spark/jars.
# Usage: tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/verify_out
set -e
cd /root/repo
JAR=target/scala-2.13/tigatespark_2.13-0.1.0.jar
# Dev probes live in the test sourceset (they are bench instruments,
# not product code) — Test/compile emits them to test-classes.
TESTCLASSES=target/scala-2.13/test-classes
if [ "${SKIP_BUILD:-0}" != "1" ]; then
  sbt -batch package Test/compile > /tmp/sbt_package.log 2>&1 || { tail -40 /tmp/sbt_package.log; exit 1; }
fi
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# Heap scales with the benched core count (same rule as build.sbt):
# N concurrent local-mode tasks share one JVM; 2 GiB/core, clamp [8,64]g.
if [ -z "${SPARK_DRIVER_MEM:-}" ]; then
  CPUS=${SPARK_GRAFT_CPUS:-4}
  G=$(( CPUS * 2 )); [ "$G" -lt 8 ] && G=8; [ "$G" -gt 64 ] && G=64
  SPARK_DRIVER_MEM="${G}g"
fi
exec java $ADDOPENS -Xmx${SPARK_DRIVER_MEM} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/opt/spark/jars/*:$JAR:$TESTCLASSES" "$@"
