#!/bin/bash
# Round-8 sf100 pass over the round-7 study's >=10x/decade tail
# (q_tpch_q18 11.7x, q_join_bloom 10.9x, q_join_multi 10.0x) after their
# plan fixes: q18 semi-reduces orders+lineitem by the broadcast big-order
# keys before any customer join; q_join_multi eagerly re-aggregates to
# per-order then per-customer grain before each exchange; q_join_bloom
# sizes its bitmap from parquet-footer stats and probes via broadcast-hash
# joins (O(1) word lookups). One fresh process per query (spill dirs are
# freed at exit — see run_sf100_study.sh).
set -x
TAIL="q_tpch_q18 q_join_bloom q_join_multi"
OUTDIR=/tmp/sf100_tail_r8
mkdir -p "$OUTDIR"
cd /tmp
for q in $TAIL; do
  rm -rf /tmp/spark-* /tmp/blockmgr-* 2>/dev/null
  env TZ=America/New_York DRIVER_SIM_ONLY="$q" \
    DRIVER_SIM_OUT="$OUTDIR/$q.json" \
    PYSPARK_SUBMIT_ARGS="--driver-memory 48g pyspark-shell" \
    python /root/repo/tools/driver_sim.py /root/repo/testdata/sf100 \
    > "$OUTDIR/$q.log" 2>&1
  tail -1 "$OUTDIR/$q.log"
  python /root/repo/tools/merge_sim_parts.py "$OUTDIR" \
    /root/repo/evidence/driver_sim_sf100_tail_r8.json
done
rm -rf /tmp/spark-* /tmp/blockmgr-* 2>/dev/null
echo DONE_SF100_TAIL_R8
