#!/bin/bash
# Round-11 bench adjudication (VERDICT r10 item 1): same-boot,
# ALTERNATING-ORDER A/B across the r9 (51d29ae), r10 (43c97e3) and r11
# (HEAD) trees on the queries the r10 driver bench flagged, >= 6
# runs/query/tree (3 alternating JVM pairs x 2 in-JVM runs), medians
# assembled by tools/ab_collect.py. Alternation distributes any
# box-load drift equally across trees, so a real plan regression shows
# as a tree-local delta and noise shows everywhere at once.
#
# Prereqs: r9/r10 worktrees compiled at /tmp/ab/r9, /tmp/ab/r10;
# /root/repo compiled. Run on a QUIET box only.
set -e
cd /root/repo
source tools/_spark_env.sh
SF=${1:-/root/testdata/sf0.1}
REPS=${2:-3}
Q_ALL="k6_corpus_overlap d11_containment d4_ngram_jaccard v5_kmeans k7_count_min"
Q_R9="k6_corpus_overlap d11_containment d4_ngram_jaccard v5_kmeans" # k7 is r10+
rm -f /tmp/ab/out_r9.txt /tmp/ab/out_r10.txt /tmp/ab/out_r11.txt
run_tree() { # tree classdir names...
  local tree=$1 cls=$2; shift 2
  java $ADD_OPENS -Xmx32g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$cls:/opt/spark/jars/*" graft.Profile "$SF" 2 "$@" \
    >> "/tmp/ab/out_$tree.txt" 2>/dev/null || true
}
for rep in $(seq 1 "$REPS"); do
  echo "[ab] pass $rep/$REPS"
  run_tree r9  /tmp/ab/r9/target/scala-2.13/classes  $Q_R9
  run_tree r10 /tmp/ab/r10/target/scala-2.13/classes $Q_ALL
  run_tree r11 /root/repo/target/scala-2.13/classes  $Q_ALL
done
python3 tools/ab_collect.py "$SF" "$REPS" > bench/ab_r11_sf0.1.json
cat bench/ab_r11_sf0.1.json
