#!/bin/bash
# Round-4 TPU measurement chain (run as ONE process; never overlap TPU jobs):
# 1) preset re-measurements under the pinned bench.py shapes (verdict #5)
# 2) Kreyvium flagship through the staged runtime (verdict #8)
# 3) a staged p=30 ISCAS85 circuit (runtime staging showcase)
set -u
cd "$(dirname "$0")/.."
mkdir -p outputs/tpu_runs

echo "=== preset p8"
python bench.py --preset p8 --batch 512 --iters 8 2>outputs/tpu_runs/preset_p8.err | tee outputs/tpu_runs/preset_p8.json
echo "=== preset p16"
python bench.py --preset p16 --batch 328 --iters 8 2>outputs/tpu_runs/preset_p16.err | tee outputs/tpu_runs/preset_p16.json
echo "=== anchor fused"
python bench.py --batch 512 --iters 8 2>outputs/tpu_runs/anchor_fused.err | tee outputs/tpu_runs/anchor_fused.json
echo "=== kreyvium staged (4-sigma default)"
python -m tfhe_fbs_map_tpu.runtime outputs/generated/kreyvium_stream_v1_10_search.lbf \
  --batch 16 --repeat 2 --checkpoint /tmp/kv_r4.ckpt.npz --checkpoint-every 12 \
  2>outputs/tpu_runs/kreyvium_staged.err | tail -1 | tee outputs/tpu_runs/kreyvium_staged.json
echo "=== c6288r p=30 staged"
python -m tfhe_fbs_map_tpu.runtime outputs/iscas85/c6288r_30_search.lbf \
  --batch 16 --repeat 2 2>outputs/tpu_runs/c6288r_30_staged.err | tail -1 | tee outputs/tpu_runs/c6288r_30.json
echo "=== AES-128 (Bristol flagship, p=4)"
python -m tfhe_fbs_map_tpu.runtime outputs/bristol/aes_128_4_search.lbf \
  --batch 16 --repeat 2 2>outputs/tpu_runs/aes_128_4.err | tail -1 | tee outputs/tpu_runs/aes_128_4.json
echo "=== chain done"
