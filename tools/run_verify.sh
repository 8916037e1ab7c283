#!/bin/bash
# Local Verify runner with the same JVM module options sbt/driver use.
# Usage: tools/run_verify.sh <sfDir> <outDir> [onlyCommaList]
set -e
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
  java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
  java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
  java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
  java.base/sun.util.calendar; do OPENS="$OPENS --add-opens $p=ALL-UNNAMED"; done
# -Dfile.encoding: no LANG/LC_ALL in the container -> US-ASCII default
# charset, under which Spark's variant builder mangles non-ASCII strings
exec java $OPENS -Xmx${SPARK_DRIVER_MEM:-8g} -Dspark.ui.enabled=false \
  -Dfile.encoding=UTF-8 \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" graft.Verify "$@"
