#!/bin/bash
# Round-6 scale extension, third decade: the exact-integer money set at
# sf100 (600 M lineitem, ~21 GB parquet; events/documents/embeddings are
# sf10 stand-ins — see testdata/sf100/README.txt).
#
# ONE PROCESS PER QUERY: a single long-lived session accumulates shuffle
# spill across queries faster than Python GC releases the dependencies —
# the first sf100 attempt filled the disk that way. A fresh process per
# query lets Spark delete its local dirs at exit, so peak disk usage is
# one query's spill, not the sum; leaked dirs from hard kills are swept
# between queries. q_source_orc is excluded at this decade only because
# its staged ORC round-trip would write an extra ~18 GB copy of lineitem
# (the adapter is already hash-proven at sf10).
set -x
MONEY="q_agg_group q_agg_minmax_by q_cube q_graph_degree q_join_bloom q_join_multi q_mom_growth q_percent_total q_unpivot q_tpch_q2 q_tpch_q3 q_tpch_q4 q_tpch_q5 q_tpch_q6 q_tpch_q7 q_tpch_q8 q_tpch_q9 q_tpch_q9_full q_tpch_q10 q_tpch_q11 q_tpch_q12 q_tpch_q13 q_tpch_q14 q_tpch_q15 q_tpch_q16 q_tpch_q17 q_tpch_q18 q_tpch_q19 q_tpch_q20 q_tpch_q21 q_tpch_q22"
OUTDIR=/tmp/sf100_parts
mkdir -p "$OUTDIR"
cd /tmp
for q in $MONEY; do
  rm -rf /tmp/spark-* /tmp/blockmgr-* 2>/dev/null
  env TZ=America/New_York DRIVER_SIM_ONLY="$q" \
    DRIVER_SIM_OUT="$OUTDIR/$q.json" \
    PYSPARK_SUBMIT_ARGS="--driver-memory 48g pyspark-shell" \
    python /root/repo/tools/driver_sim.py /root/repo/testdata/sf100 \
    > "$OUTDIR/$q.log" 2>&1
  tail -1 "$OUTDIR/$q.log"
  # merge incrementally so a killed run still leaves a valid partial report
  python /root/repo/tools/merge_sim_parts.py "$OUTDIR" \
    /root/repo/evidence/driver_sim_sf100_money_r6.json
done
rm -rf /tmp/spark-* /tmp/blockmgr-* 2>/dev/null
echo DONE_SF100_STUDY
