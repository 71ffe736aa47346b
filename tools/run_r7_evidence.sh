#!/bin/bash
# Round-7 evidence refresh (VERDICT r6 items 2 + 7):
#   1. full 275-query registry at sf0.1 (hash gate; timings recorded but
#      possibly contended with dev work — timing-sensitive reruns happen solo)
#   2. regenerate sf1 (deleted at round end) and run the full registry there
# Sequential inside this script.
set -x
cd /tmp
env TZ=America/New_York DRIVER_SIM_OUT=/root/repo/evidence/driver_sim_sf0.1_r7.json \
  python /root/repo/tools/driver_sim.py /root/testdata/sf0.1 \
  > /tmp/sim_sf01_r7.log 2>&1
python /root/repo/tools/gen_scale.py /root/testdata/sf0.1 /root/repo/testdata/sf1 10 \
  > /tmp/gen_sf1_r7.log 2>&1
env TZ=America/New_York DRIVER_SIM_OUT=/root/repo/evidence/driver_sim_sf1_r7.json \
  PYSPARK_SUBMIT_ARGS="--driver-memory 48g pyspark-shell" \
  python /root/repo/tools/driver_sim.py /root/repo/testdata/sf1 \
  > /tmp/sim_sf1_r7.log 2>&1
echo DONE_R7_EVIDENCE
