#!/bin/bash
# Amplify an sf dir by K with join/dedup structure preserved (graft.ScaleGen).
# Usage: tools/run_scalegen.sh [indir] [outdir] [K]
set -e
cd /root/repo
source tools/_spark_env.sh
exec java $ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-32g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.ScaleGen "$@"
