#!/bin/bash
# Round-5 scale study: sequential so timings are contention-free.
set -x
SLOW15="ref_event_pipeline,llm_sim_recall,q_graph_triangles,llm_quality_classifier,llm_dedup_cc,llm_dedup_span_removal,q_copurchase_pairs,llm_dedup_quality,llm_sim_ivfpq,llm_knn_label,q_recursive_cte,ref_session_repair,llm_dedup_near,llm_sim_ann,llm_dedup_span"
cd /tmp
# 1. sf0.1 full registry with timings (slope baseline)
env TZ=America/New_York DRIVER_SIM_OUT=/root/repo/evidence/driver_sim_sf0.1_r5.json \
  python /root/repo/tools/driver_sim.py /root/testdata/sf0.1 \
  > /tmp/sim_sf01_r5.log 2>&1
# 2. sf1 full registry, 48g driver heap (prior run OOM'd at default 1g)
env TZ=America/New_York DRIVER_SIM_OUT=/root/repo/evidence/driver_sim_sf1_r5.json \
  PYSPARK_SUBMIT_ARGS="--driver-memory 48g pyspark-shell" \
  python /root/repo/tools/driver_sim.py /root/repo/testdata/sf1 \
  > /tmp/sim_sf1_r5.log 2>&1
# 3. bench slowest-15 at sf0.1 then sf1
cd /root/repo
env SPARK_GRAFT_ONLY="$SLOW15" SPARK_GRAFT_BENCH_OUT=/root/repo/evidence/bench_sf0.1_slowest.json \
  python bench.py > /tmp/bench_sf01_slow.log 2>&1
env SPARK_GRAFT_ONLY="$SLOW15" SPARK_GRAFT_BENCH_OUT=/root/repo/evidence/bench_sf1_slowest.json \
  SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 \
  PYSPARK_SUBMIT_ARGS="--driver-memory 48g pyspark-shell" \
  python bench.py > /tmp/bench_sf1_slow.log 2>&1
echo DONE_SCALE_STUDY
