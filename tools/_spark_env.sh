#!/bin/bash
# Shared JVM environment for the tools/ runners: classpath over the compiled
# classes + the unmanaged Spark jars, and the --add-opens set Spark 4 needs
# on Java 17. Source this, then exec:
#   exec java $ADD_OPENS -cp "$CP" <main> "$@"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
