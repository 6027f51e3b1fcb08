#!/bin/bash
# Local stand-in for the driver's verify step: runs graft.Verify on a given
# sf dir, dumping each SparkEntry.queries result to parquet + oracle_sql.json.
# Usage: tools/run_verify.sh [sfdir] [outdir] [class] [query names...]
# Extra args select specific queries (rehearsal-tier spot checks).
set -e
SFDIR=${1:-/root/testdata/sf0.01}
OUTDIR=${2:-/tmp/verify_out}
CLASS=${3:-graft.Verify}
shift $(( $# > 3 ? 3 : $# ))
cd /root/repo
source tools/_spark_env.sh
rm -rf "$OUTDIR"
exec java $ADD_OPENS -Xmx12g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$CLASS" "$SFDIR" "$OUTDIR" "$@"
