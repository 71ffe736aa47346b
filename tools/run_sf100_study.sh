#!/bin/bash
# Round-6 scale extension, third decade: the exact-integer money set at
# sf100 (600 M lineitem, ~24 GB parquet). Correctness is the headline
# (the grid discipline must hold at any magnitude); timings land in the
# sim JSON for the slope CSV. Sequential, contention-free.
set -x
MONEY="q_agg_group,q_agg_minmax_by,q_cube,q_graph_degree,q_join_bloom,q_join_multi,q_mom_growth,q_percent_total,q_source_orc,q_unpivot,q_tpch_q2,q_tpch_q3,q_tpch_q4,q_tpch_q5,q_tpch_q6,q_tpch_q7,q_tpch_q8,q_tpch_q9,q_tpch_q9_full,q_tpch_q10,q_tpch_q11,q_tpch_q12,q_tpch_q13,q_tpch_q14,q_tpch_q15,q_tpch_q16,q_tpch_q17,q_tpch_q18,q_tpch_q19,q_tpch_q20,q_tpch_q21,q_tpch_q22"
cd /tmp
env TZ=America/New_York DRIVER_SIM_ONLY="$MONEY" \
  DRIVER_SIM_OUT=/root/repo/evidence/driver_sim_sf100_money_r6.json \
  PYSPARK_SUBMIT_ARGS="--driver-memory 80g pyspark-shell" \
  python /root/repo/tools/driver_sim.py /root/repo/testdata/sf100 \
  > /tmp/sim_sf100_money.log 2>&1
echo DONE_SF100_STUDY
