#!/bin/bash
# Run a graft main class outside sbt (JDK17 add-opens + spark jars).
CLASS=$1; shift
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic; do OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"; done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"; done
# ExplicitGCInvokesConcurrent: Spark's ContextCleaner periodic
# System.gc() must not stop the world for seconds on a big heap
exec java $OPENS -XX:+ExplicitGCInvokesConcurrent \
  -Xmx${SPARK_DRIVER_MEM:-48g} -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  ${GRAFT_JAVA_OPTS:-} \
  -cp /root/repo/target/scala-2.13/classes:"/opt/spark/jars/*" "$CLASS" "$@"
