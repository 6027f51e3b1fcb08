#!/bin/bash
# Per-query timing loop (graft.Profile). Usage: tools/run_profile.sh [sfdir] [repeats] [name...]
set -e
cd /root/repo
source tools/_spark_env.sh
exec java $ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-32g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Profile "$@"
