#!/bin/bash
# Round-9 scale evidence ladder (round-8 verdict items 1+2):
#  1. FULL registry at sf0.1, sf1, then sf10 (--driver-memory 64g) — the
#     first sf10 record covering all queries, incl. the MV family, every
#     stream gate and the LLM curation surface.
#  2. sf100 flagship sweep: the relational tail (q18 + bucketed variant,
#     bloom, multi, graph_degree) AND the LLM-pipeline flagships
#     (near-dup portable, span dedup family, pipeline_e2e, bm25) on the
#     now-REAL sf100 documents table — one fresh process per query so
#     spill dirs free at exit (run_sf100_study.sh discipline).
#  3. Cold SOLO sf10 re-measures of the same sweep set so scale_slope_r9
#     divides cold-by-cold (round-8 "what's wrong" #1).
# Sequential, uncontended; run with nothing else on the box.
set -x
cd /tmp

env TZ=America/New_York \
  DRIVER_SIM_OUT=/root/repo/evidence/driver_sim_sf0.1_r9.json \
  python /root/repo/tools/driver_sim.py /root/testdata/sf0.1 \
  > /tmp/sim_sf0.1_r9.log 2>&1
tail -1 /tmp/sim_sf0.1_r9.log

env TZ=America/New_York \
  DRIVER_SIM_OUT=/root/repo/evidence/driver_sim_sf1_r9.json \
  PYSPARK_SUBMIT_ARGS="--driver-memory 48g pyspark-shell" \
  python /root/repo/tools/driver_sim.py /root/repo/testdata/sf1 \
  > /tmp/sim_sf1_r9.log 2>&1
tail -1 /tmp/sim_sf1_r9.log

# The five brute-force-quadratic ORACLES (geo family, skyline) are
# intractable at sf10 (sf1 ratios project 0.5-1.7 h EACH in DuckDB); the
# engine side is a linear grid equi-join and still runs + times.  Their
# hash gates hold at sf0.01/0.1/1.
env TZ=America/New_York \
  DRIVER_SIM_OUT=/root/repo/evidence/driver_sim_sf10_full_r9.json \
  DRIVER_SIM_ORACLE_SKIP="q_skyline,q_geo_join,q_geo_nearest,q_geo_nearest_wrap,q_geo_haversine" \
  PYSPARK_SUBMIT_ARGS="--driver-memory 64g pyspark-shell" \
  python /root/repo/tools/driver_sim.py /root/repo/testdata/sf10 \
  > /tmp/sim_sf10_full_r9.log 2>&1
tail -1 /tmp/sim_sf10_full_r9.log

SWEEP="q_tpch_q18 q_tpch_q18_bucketed q_join_bloom q_join_multi q_graph_degree llm_dedup_near_portable llm_dedup_span llm_dedup_span_removal llm_pipeline_e2e llm_bm25"

run_sweep () {  # $1 = sf dir, $2 = out dir, $3 = merged json, $4 = heap
  local SF="$1" OUTDIR="$2" MERGED="$3" HEAP="$4"
  mkdir -p "$OUTDIR" "$OUTDIR/prebuild"
  for q in $SWEEP; do
    rm -rf /tmp/spark-* /tmp/blockmgr-* 2>/dev/null
    if [ "$q" = "q_tpch_q18_bucketed" ]; then
      # the demo's headline is the RECURRING run: prebuild pays the
      # one-time bucketed write (kept as evidence in prebuild/), then a
      # second cold process re-registers the existing files (no rewrite —
      # sinks/bucketed.py _SUCCESS path) and is the timed measurement
      rm -rf /tmp/fxa_spark_bucketed_* 2>/dev/null
      env TZ=America/New_York DRIVER_SIM_ONLY="$q" \
        DRIVER_SIM_OUT="$OUTDIR/prebuild/$q.json" \
        PYSPARK_SUBMIT_ARGS="--driver-memory $HEAP pyspark-shell" \
        python /root/repo/tools/driver_sim.py "$SF" \
        > "$OUTDIR/prebuild/$q.log" 2>&1
      tail -1 "$OUTDIR/prebuild/$q.log"
      rm -rf /tmp/spark-* /tmp/blockmgr-* 2>/dev/null
    else
      rm -rf /tmp/fxa_spark_bucketed_* 2>/dev/null
    fi
    env TZ=America/New_York DRIVER_SIM_ONLY="$q" \
      DRIVER_SIM_OUT="$OUTDIR/$q.json" \
      PYSPARK_SUBMIT_ARGS="--driver-memory $HEAP pyspark-shell" \
      python /root/repo/tools/driver_sim.py "$SF" \
      > "$OUTDIR/$q.log" 2>&1
    tail -1 "$OUTDIR/$q.log"
    python /root/repo/tools/merge_sim_parts.py "$OUTDIR" "$MERGED"
  done
}

run_sweep /root/repo/testdata/sf10 /tmp/sf10_cold_r9 \
  /root/repo/evidence/driver_sim_sf10_cold_r9.json 48g
run_sweep /root/repo/testdata/sf100 /tmp/sf100_r9 \
  /root/repo/evidence/driver_sim_sf100_r9.json 64g
rm -rf /tmp/spark-* /tmp/blockmgr-* /tmp/fxa_spark_bucketed_* 2>/dev/null
echo DONE_R9_SCALE
