#!/bin/bash
# Round-4 session-2 chain 2: the Kreyvium flagship at the sweep's min-cost
# mapping config (p=3 "best": 11115 boots at anchor-class params, est
# 0.84 s/eval), plus the p=10 program re-run under the corrected staged
# noise model (cli.py wires_from_stage2 fix) as the on-hardware
# regression for that fix.  ONE process; compact keys only.
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

run_step kreyvium_p3 python -m tfhe_fbs_map_tpu.runtime \
  outputs/generated/kreyvium_stream_v1_3_best.lbf \
  --batch 16 --repeat 2 --orientation fused_otf

run_step kreyvium_staged_fixed python -m tfhe_fbs_map_tpu.runtime \
  outputs/generated/kreyvium_stream_v1_10_search.lbf \
  --batch 16 --repeat 2 --orientation fused_otf

echo "=== chain 2 done ($(date +%H:%M:%S))"
