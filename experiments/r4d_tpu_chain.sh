#!/bin/bash
# Round-4 session-2 chain 3: measure the remaining regenerated ISCAS85
# circuits (completing the 10/10 suite on hardware) and three mid-size
# ISCAS89 circuits, each at its sweep min-cost config.  ONE process;
# compact keys only.
set -u
cd "$(dirname "$0")/.."
mkdir -p outputs/tpu_runs

run_step() {  # name cmd...
  local name=$1; shift
  if [ -s "outputs/tpu_runs/${name}.json" ]; then
    echo "=== ${name}: done (skip)"; return
  fi
  echo "=== ${name} ($(date +%H:%M:%S))"
  sleep 45
  "$@" 2>"outputs/tpu_runs/${name}.err" | tail -1 | tee "outputs/tpu_runs/${name}.json"
}

RUN="python -m tfhe_fbs_map_tpu.runtime"
run_step c499r_3 $RUN outputs/iscas85/c499r_3_search.lbf --batch 16 --repeat 2 --orientation fused_otf
run_step c2670r_4 $RUN outputs/iscas85/c2670r_4_searchdc.lbf --batch 16 --repeat 2 --orientation fused_otf
run_step c3540r_10 $RUN outputs/iscas85/c3540r_10_searchdc.lbf --batch 16 --repeat 2 --orientation fused_otf
run_step s1423r_3 $RUN outputs/iscas89/s1423r_3_search.lbf --batch 16 --repeat 2 --orientation fused_otf
run_step s838r_10 $RUN outputs/iscas89/s838r_10_search.lbf --batch 16 --repeat 2 --orientation fused_otf
run_step s9234r_3 $RUN outputs/iscas89/s9234r_3_search.lbf --batch 16 --repeat 2 --orientation fused_otf
run_step s5378r_3 $RUN outputs/iscas89/s5378r_3_search.lbf --batch 16 --repeat 2 --orientation fused_otf
echo "=== chain 3 done ($(date +%H:%M:%S))"
