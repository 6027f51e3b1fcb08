#!/bin/bash
# Round-12 bench adjudication (VERDICT r11 item 1): same-boot,
# ALTERNATING-ORDER A/B between the r11 tree (26bfe1b — the driver-graded
# round-11 state) and r12 HEAD on the queries the r11 driver bench left
# without a committed artifact: d14b (the 35.4 s driver reading vs the
# 14-16 s quiet-box readings), plus m7 and v22 (new in r11, never A/B'd)
# and k6/d11 as calibration anchors with known adjudicated medians.
# >= 6 runs/query/tree (3 alternating JVM pairs x 2 in-JVM runs), medians
# assembled by tools/ab_collect_r12.py. Alternation spreads box-load
# drift equally across trees: a real plan regression shows tree-local,
# noise shows everywhere at once.
#
# Prereqs: r11 worktree compiled at /tmp/ab12/r11; /root/repo compiled.
# Run on a QUIET box only.
set -e
cd /root/repo
source tools/_spark_env.sh
SF=${1:-/root/testdata/sf0.1}
REPS=${2:-3}
Q="d14b_fuzzy_join_k2 m7_video_fingerprint v22_trained_ivf_serve k6_corpus_overlap d11_containment"
rm -f /tmp/ab12/out_r11.txt /tmp/ab12/out_r12.txt
run_tree() { # tree classdir
  local tree=$1 cls=$2
  java $ADD_OPENS -Xmx32g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$cls:/opt/spark/jars/*" graft.Profile "$SF" 2 $Q \
    >> "/tmp/ab12/out_$tree.txt" 2>/dev/null || true
}
for rep in $(seq 1 "$REPS"); do
  echo "[ab] pass $rep/$REPS"
  run_tree r11 /tmp/ab12/r11/target/scala-2.13/classes
  run_tree r12 /root/repo/target/scala-2.13/classes
done
python3 tools/ab_collect_r12.py "$SF" "$REPS" > bench/ab_r12_sf0.1.json
cat bench/ab_r12_sf0.1.json
