#!/bin/bash
# r5 chain 2: flagship re-runs under the scan-grouped executor (their r4
# JSONs were archived as *_r4.json; the main chain skipped them), plus a
# kreyvium p=10 native scan re-run for the staged-parity story.
set -u
cd "$(dirname "$0")/.."
run_step() {
  local name=$1 tmo=$2; shift 2
  if [ -s "outputs/tpu_runs/${name}.json" ]; then
    echo "=== ${name}: done (skip)"; return
  fi
  echo "=== ${name} ($(date +%H:%M:%S))"
  sleep 45
  timeout -k 15 "$tmo" "$@" 2>"outputs/tpu_runs/${name}.err" | tail -1 \
    | tee "outputs/tpu_runs/${name}.json"
}
RUN="python -m tfhe_fbs_map_tpu.runtime"
run_step kreyvium_stream_v1_3 2400 $RUN \
  outputs/generated/kreyvium_stream_v1_3_best.lbf \
  --batch 16 --repeat 2 --orientation fused_otf
run_step aes_128_4 3000 $RUN outputs/bristol/aes_128_4_search.lbf \
  --batch 16 --repeat 2 --orientation fused_otf

# batch-64 provenance re-runs the main chain skipped (their r4 batch-16
# JSONs are archived as *_b16r4.json)
run_step c499r_3 2400 $RUN outputs/iscas85/c499r_3_search.lbf \
  --batch 64 --repeat 2 --orientation fused_otf
run_step c2670r_4 2400 $RUN outputs/iscas85/c2670r_4_searchdc.lbf \
  --batch 64 --repeat 2 --orientation fused_otf
run_step c3540r_10 2400 $RUN outputs/iscas85/c3540r_10_searchdc.lbf \
  --batch 64 --repeat 2 --orientation fused_otf
run_step s1423r_3 2400 $RUN outputs/iscas89/s1423r_3_search.lbf \
  --batch 64 --repeat 2 --orientation fused_otf
run_step s838r_10 2400 $RUN outputs/iscas89/s838r_10_search.lbf \
  --batch 64 --repeat 2 --orientation fused_otf
run_step s9234r_3 2400 $RUN outputs/iscas89/s9234r_3_search.lbf \
  --batch 64 --repeat 2 --orientation fused_otf

# Full PIPELINED recalibration (all 6 families, chained-call timing —
# the first calibration forced a readback per call and over-measured
# dispatch; see calibrate_runtime.py).  Overwrites calibration.json.
echo "=== recalibrate pipelined ($(date +%H:%M:%S))"; sleep 45
timeout -k 30 5400 python -u experiments/calibrate_runtime.py \
  --nbs 1,4,16,32 --batch 8 2>outputs/tpu_runs/calibrate2.err \
  | tail -1 | tee outputs/tpu_runs/calibrate2.json
echo "=== r5b done ($(date +%H:%M:%S))"
