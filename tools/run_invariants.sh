#!/bin/bash
# Tier-agnostic invariant gate for the operators whose oracles embed the
# all-pairs join (d6, pipe_corpus_prep). Usage: tools/run_invariants.sh [sfdir]
set -e
SFDIR=${1:-/root/testdata/sf0.01}
cd /root/repo
source tools/_spark_env.sh
exec java $ADD_OPENS -Xmx16g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Invariants "$SFDIR"
