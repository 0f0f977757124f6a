#!/bin/bash
# Round-4 session-2 chain 4: re-measure the chain-3 circuits at batch 64
# (the README circuit-table convention — small circuits are
# launch-overhead-dominated at batch 16).  Overwrites the batch-16
# result JSONs; bit-exactness is re-verified in-run.
set -u
cd "$(dirname "$0")/.."
mkdir -p outputs/tpu_runs

run_step() {  # name cmd...
  local name=$1; shift
  if grep -q '"batch": 64' "outputs/tpu_runs/${name}.json" 2>/dev/null; then
    echo "=== ${name}: done at b64 (skip)"; return
  fi
  echo "=== ${name} ($(date +%H:%M:%S))"
  sleep 45
  "$@" 2>"outputs/tpu_runs/${name}.err" | tail -1 | tee "outputs/tpu_runs/${name}.json"
}

RUN="python -m tfhe_fbs_map_tpu.runtime"
run_step c499r_3 $RUN outputs/iscas85/c499r_3_search.lbf --batch 64 --repeat 2 --orientation fused_otf
run_step c2670r_4 $RUN outputs/iscas85/c2670r_4_searchdc.lbf --batch 64 --repeat 2 --orientation fused_otf
run_step c3540r_10 $RUN outputs/iscas85/c3540r_10_searchdc.lbf --batch 64 --repeat 2 --orientation fused_otf
run_step s1423r_3 $RUN outputs/iscas89/s1423r_3_search.lbf --batch 64 --repeat 2 --orientation fused_otf
run_step s838r_10 $RUN outputs/iscas89/s838r_10_search.lbf --batch 64 --repeat 2 --orientation fused_otf
run_step s9234r_3 $RUN outputs/iscas89/s9234r_3_search.lbf --batch 64 --repeat 2 --orientation fused_otf
run_step s5378r_3 $RUN outputs/iscas89/s5378r_3_search.lbf --batch 64 --repeat 2 --orientation fused_otf
echo "=== chain 4 done ($(date +%H:%M:%S))"
