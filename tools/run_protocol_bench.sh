#!/bin/bash
# Protocol-class ledger runner: prints graft.ProtocolBench's single JSON
# line (store-path timings for every Bench.ProtocolClass query).
# Usage: tools/run_protocol_bench.sh [sfdir] [cpus]
set -e
export SPARK_GRAFT_SF_DIR=${1:-${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}}
export SPARK_GRAFT_CPUS=${2:-${SPARK_GRAFT_CPUS:-32}}
cd /root/repo
source tools/_spark_env.sh
exec java $ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-32g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.ProtocolBench
