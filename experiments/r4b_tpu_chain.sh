#!/bin/bash
# Round-4 session-2 TPU measurement chain (ONE process; never overlap TPU
# jobs on the tunneled backend).  Resumable: steps whose result JSON already
# holds data are skipped.  All runs force the compact-key orientation —
# every streamed >=10 GB key-matrix build this round has wedged the tunnel
# (see CLAUDE.md / PERF.md r4).
set -u
cd "$(dirname "$0")/.."
mkdir -p outputs/tpu_runs

run_step() {  # name cmd...
  local name=$1; shift
  if [ -s "outputs/tpu_runs/${name}.json" ]; then
    echo "=== ${name}: done (skip)"; return
  fi
  echo "=== ${name} ($(date +%H:%M:%S))"
  sleep 45     # let the tunneled backend settle between processes
  "$@" 2>"outputs/tpu_runs/${name}.err" | tail -1 | tee "outputs/tpu_runs/${name}.json"
}

# 1. Flagship: Kreyvium-1152 through the staged dual-family pipeline
#    (VERDICT r3 task #8: < 1.8 s/eval; staged cost model says 0.81 s).
run_step kreyvium_staged python -m tfhe_fbs_map_tpu.runtime \
  outputs/generated/kreyvium_stream_v1_10_search.lbf \
  --batch 16 --repeat 2 --orientation fused_otf

# 2. p16 preset re-measure under the pinned k=1 N=1024 shapes
#    (README table row marked "re-measure pending").
run_step preset_p16 python bench.py --preset p16 --batch 328 --iters 8

# 3. Bristol AES-128 end-to-end on TPU (the reference's flagship Bristol
#    artifact; VERDICT r3 missing #4) — p=4 search, 20759 bootstraps.
run_step aes_128_4 python -m tfhe_fbs_map_tpu.runtime \
  outputs/bristol/aes_128_4_search.lbf \
  --batch 16 --repeat 2 --orientation fused_otf

echo "=== chain done ($(date +%H:%M:%S))"
