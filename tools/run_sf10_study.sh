#!/bin/bash
# Round-6 scale extension: money queries + slowest-15 bench at sf10
# (600 M-row-equivalent lineitem = 60 M rows). Sequential so timings are
# contention-free. Driver heap 64g (sf1 needed 48g; sf10 is 10x data but
# queries aggregate, not collect — headroom anyway).
set -x
MONEY="q_agg_group,q_agg_minmax_by,q_cube,q_graph_degree,q_join_bloom,q_join_multi,q_mom_growth,q_percent_total,q_source_orc,q_unpivot,q_tpch_q2,q_tpch_q3,q_tpch_q4,q_tpch_q5,q_tpch_q6,q_tpch_q7,q_tpch_q8,q_tpch_q9,q_tpch_q9_full,q_tpch_q10,q_tpch_q11,q_tpch_q12,q_tpch_q13,q_tpch_q14,q_tpch_q15,q_tpch_q16,q_tpch_q17,q_tpch_q18,q_tpch_q19,q_tpch_q20,q_tpch_q21,q_tpch_q22"
SLOW15="ref_event_pipeline,llm_sim_recall,q_graph_triangles,llm_quality_classifier,llm_dedup_cc,llm_dedup_span_removal,q_copurchase_pairs,llm_dedup_quality,llm_sim_ivfpq,llm_knn_label,q_recursive_cte,ref_session_repair,llm_dedup_near,llm_sim_ann,llm_dedup_span"
cd /tmp
env TZ=America/New_York DRIVER_SIM_ONLY="$MONEY" \
  DRIVER_SIM_OUT=/root/repo/evidence/driver_sim_sf10_money_r6.json \
  PYSPARK_SUBMIT_ARGS="--driver-memory 64g pyspark-shell" \
  python /root/repo/tools/driver_sim.py /root/repo/testdata/sf10 \
  > /tmp/sim_sf10_money.log 2>&1
cd /root/repo
env SPARK_GRAFT_ONLY="$SLOW15" \
  SPARK_GRAFT_BENCH_OUT=/root/repo/evidence/bench_sf10_slowest.json \
  SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf10 \
  PYSPARK_SUBMIT_ARGS="--driver-memory 64g pyspark-shell" \
  python bench.py > /tmp/bench_sf10_slow.log 2>&1
echo DONE_SF10_STUDY
