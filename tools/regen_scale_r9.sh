#!/bin/bash
# Round-9: the scale testdata did NOT survive the round-8->9 container
# swap (SURVEY 12's infra note says to check; this round the check came
# back empty).  Rebuild the whole ladder deterministically from the
# driver's sf0.1:
#   sf1   = gen_scale(sf0.1, x10)
#   sf10  = gen_scale(sf1,   x10)
#   sf100 = gen_sf100(sf10)  TPC-H tables      (content symlinked)
#         + gen_sf100_content(sf10)            (REAL 10x docs/embeddings)
# Each step is skipped if its directory already holds a lineitem footer,
# so the script is re-runnable after a partial failure.
set -e
cd /root/repo
TD=/root/repo/testdata
mkdir -p "$TD"

have () { python - "$1" <<'EOF'
import sys, os, pyarrow.parquet as pq
p = os.path.join(sys.argv[1], "lineitem.parquet")
try:
    pq.read_metadata(p); sys.exit(0)
except Exception:
    sys.exit(1)
EOF
}

if ! have "$TD/sf1"; then
  echo "== gen sf1"; time python tools/gen_scale.py /root/testdata/sf0.1 "$TD/sf1" 10
fi
if ! have "$TD/sf10"; then
  echo "== gen sf10"; time python tools/gen_scale.py "$TD/sf1" "$TD/sf10" 10
fi
if ! have "$TD/sf100"; then
  echo "== gen sf100 tpch"; time python tools/gen_sf100.py "$TD/sf10" "$TD/sf100"
fi
if [ ! -s "$TD/sf100/documents.parquet" ] || [ -L "$TD/sf100/documents.parquet" ]; then
  echo "== gen sf100 content"; time python tools/gen_sf100_content.py "$TD/sf10" "$TD/sf100"
fi
du -sh "$TD"/sf*
echo DONE_REGEN_R9
