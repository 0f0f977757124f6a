#!/bin/bash
# Round-4 TPU measurement chain (run as ONE process; never overlap TPU jobs).
# Resumable: steps whose result JSON already holds data are skipped.
# p8 runs the compact-key orientation: the 12.1 GB streamed matrices sit
# right at the HBM budget and their build wedged a 35+ min key prep.
set -u
cd "$(dirname "$0")/.."
mkdir -p outputs/tpu_runs

run_step() {  # name cmd...
  local name=$1; shift
  if [ -s "outputs/tpu_runs/${name}.json" ]; then
    echo "=== ${name}: done (skip)"; return
  fi
  echo "=== ${name}"
  sleep 45     # let the tunneled backend settle between processes
  "$@" 2>"outputs/tpu_runs/${name}.err" | tail -1 | tee "outputs/tpu_runs/${name}.json"
}

run_step preset_p8 python bench.py --preset p8 --orientation fused_otf --batch 512 --iters 8
run_step preset_p16 python bench.py --preset p16 --batch 328 --iters 8
run_step anchor_fused python bench.py --batch 512 --iters 8
run_step kreyvium_staged python -m tfhe_fbs_map_tpu.runtime \
  outputs/generated/kreyvium_stream_v1_10_search.lbf \
  --batch 16 --repeat 2 --checkpoint /tmp/kv_r4.ckpt.npz --checkpoint-every 12
run_step c6288r_30 python -m tfhe_fbs_map_tpu.runtime \
  outputs/iscas85/c6288r_30_search.lbf --batch 16 --repeat 2
run_step aes_128_4 python -m tfhe_fbs_map_tpu.runtime \
  outputs/bristol/aes_128_4_search.lbf --batch 16 --repeat 2
echo "=== chain done"
