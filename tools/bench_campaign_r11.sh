#!/bin/bash
# Round-11 quiet-box bench campaign — runs everything SEQUENTIALLY so no
# job distorts another's timings, and writes every artifact under
# bench/. Order:
#   1. alternating A/B adjudication (r9/r10/r11, sf0.1)     -> ab_r11_sf0.1.json
#   2. full r11 sweep, sf0.1, per-query block release ON    -> bench_r11_sf0.1.json
#   3. full r11 sweep, sf0.1, block release OFF (control)   -> bench_r11_sf0.1_norelease.json
#   4. full r11 sweep, sf1                                  -> bench_r11_sf1.json
#   5. protocol ledger, r11 (ProtocolBench, sf0.1)          -> protocol JSON (r11 half)
#   6. protocol ledger, r10 readings (r10-tree Profile)     -> merged into protocol_r11.json
# Run ONLY when nothing else (sbt, verify, scalegen) shares the box.
set -e
cd /root/repo
source tools/_spark_env.sh
mkdir -p bench /tmp/ab

echo "== [1/6] alternating A/B (r9/r10/r11, sf0.1) =="
tools/ab_bench_r11.sh /root/testdata/sf0.1 3

echo "== [2/6] full sweep sf0.1, release ON =="
SPARK_GRAFT_BENCH_UNPERSIST=1 tools/run_bench.sh /root/testdata/sf0.1 > /tmp/ab/bench_on.out
cp target/bench.json bench/bench_r11_sf0.1.json

echo "== [3/6] full sweep sf0.1, release OFF (control) =="
SPARK_GRAFT_BENCH_UNPERSIST=0 tools/run_bench.sh /root/testdata/sf0.1 > /tmp/ab/bench_off.out
cp target/bench.json bench/bench_r11_sf0.1_norelease.json

echo "== [4/6] full sweep sf1 =="
SPARK_GRAFT_BENCH_UNPERSIST=1 tools/run_bench.sh /tmp/graft-sf1 > /tmp/ab/bench_sf1.out
cp target/bench.json bench/bench_r11_sf1.json

echo "== [5/6] protocol ledger r11 (sf0.1) =="
tools/run_protocol_bench.sh /root/testdata/sf0.1 > /tmp/ab/protocol_r11.out

echo "== [6/6] protocol ledger r10 readings (r10 tree, sf0.1) =="
# r10 had no ProtocolBench; time the same queries through its Profile
# (same noop materialization + median-of-N discipline). d18 is r11-only.
R10Q="d15_incremental_neardup d17_incremental_cut k7s_stream_sketch \
dag_bucketed_join dag_show_tvl_incremental dag_fct_incremental \
dag_fct_maintenance dag_microbatch dag_insert_overwrite dag_cdc_apply \
v15_persisted_ivfpq v16_index_maintenance v15s_stream_index \
pipe5_incremental_corpus v18_partitioned_index s12_scd2"
java $ADD_OPENS -Xmx32g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "/tmp/ab/r10/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Profile /root/testdata/sf0.1 3 $R10Q > /tmp/ab/protocol_r10.out 2>/dev/null

python3 tools/protocol_merge.py > bench/protocol_r11.json
echo "== campaign done =="
ls -la bench/*r11*
