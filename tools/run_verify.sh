#!/bin/bash
# Local stand-in for the driver's verify step: runs graft.Verify on a given
# sf dir, dumping each SparkEntry.queries result to parquet + oracle_sql.json.
# Usage: tools/run_verify.sh [sfdir] [outdir] [class]
set -e
SFDIR=${1:-/root/testdata/sf0.01}
OUTDIR=${2:-/tmp/verify_out}
CLASS=${3:-graft.Verify}
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
rm -rf "$OUTDIR"
exec java $ADD_OPENS -Xmx12g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$CLASS" "$SFDIR" "$OUTDIR"
