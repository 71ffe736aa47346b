#!/bin/bash
# Round-7 scale studies, sequential so timings are contention-free.
# Prereq: tools/run_r7_evidence.sh finished (sf1 data exists, sf1 full sim
# recorded). Steps:
#   1. full-registry bench at sf1 (VERDICT r6 item 7: populate the sf1_full
#      trend column for every query)
#   2. the 7 round-7 queries at sf1 (the main sf1 sim predates some of them)
#   3. gen sf10; round-7 queries + the two newest stream gates at sf10
#   4. gen sf100; per-query re-measure of the q8/q9 shuffle-cut (VERDICT
#      item 4) in fresh processes (a shared session accumulates spill).
set -x
NEW7="q_versioned_zorder,q_stream_late,q_versioned_txn,q_stream_txn,q_stream_stateful,q_geo_join,q_geo_nearest,q_graph_sssp,q_source_partitioned"
cd /tmp
env SPARK_GRAFT_BENCH_OUT=/root/repo/evidence/bench_sf1_full_r7.json \
  SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 \
  PYSPARK_SUBMIT_ARGS="--driver-memory 48g pyspark-shell" \
  python /root/repo/bench.py > /tmp/bench_sf1_full_r7.log 2>&1
env TZ=America/New_York DRIVER_SIM_ONLY="$NEW7" \
  DRIVER_SIM_OUT=/root/repo/evidence/driver_sim_sf1_new_r7b.json \
  PYSPARK_SUBMIT_ARGS="--driver-memory 48g pyspark-shell" \
  python /root/repo/tools/driver_sim.py /root/repo/testdata/sf1 \
  > /tmp/sim_sf1_new_r7b.log 2>&1
python /root/repo/tools/gen_scale.py /root/repo/testdata/sf1 /root/repo/testdata/sf10 10 \
  > /tmp/gen_sf10_r7.log 2>&1
env TZ=America/New_York DRIVER_SIM_ONLY="$NEW7,q_stream_dedup,q_stream_mv" \
  DRIVER_SIM_OUT=/root/repo/evidence/driver_sim_sf10_new_r7.json \
  PYSPARK_SUBMIT_ARGS="--driver-memory 64g pyspark-shell" \
  python /root/repo/tools/driver_sim.py /root/repo/testdata/sf10 \
  > /tmp/sim_sf10_new_r7.log 2>&1
echo DONE_R7_SCALE_THROUGH_SF10
python /root/repo/tools/gen_sf100.py /root/repo/testdata/sf10 /root/repo/testdata/sf100 \
  > /tmp/gen_sf100_r7.log 2>&1
mkdir -p /tmp/sf100_parts_r7
for q in q_tpch_q8 q_tpch_q9 q_tpch_q9_full q_tpch_q19; do
  env TZ=America/New_York DRIVER_SIM_ONLY="$q" \
    DRIVER_SIM_OUT=/tmp/sf100_parts_r7/$q.json \
    PYSPARK_SUBMIT_ARGS="--driver-memory 64g pyspark-shell" \
    python /root/repo/tools/driver_sim.py /root/repo/testdata/sf100 \
    > /tmp/sim_sf100_$q.log 2>&1
done
python /root/repo/tools/merge_sim_parts.py /tmp/sf100_parts_r7 \
  /root/repo/evidence/driver_sim_sf100_q89_r7.json
echo DONE_R7_SCALE
