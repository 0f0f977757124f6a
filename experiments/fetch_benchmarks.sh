#!/usr/bin/env bash
# Fetch the external benchmark suites (requires network egress; the
# generated suite needs none). Mirrors the reference's fetch steps
# (gen_makefile_epfl.bash:7, gen_makefile_iscas85.bash:7,
#  gen_makefile_iscas89.bash:7, gen_makefile_bristol.bash:4).
#
# WITHOUT egress the repo ships verified regenerations instead:
#  * benchmarks/iscas85/*r.bench + iscas89/*r.bench — functional
#    equivalents from the published specs, golden-model verified
#    (frontend/circuits/bench_regen.py);
#  * benchmarks/epfl/*.blif — exact-function arithmetic regenerations
#    (circuits/generators.py EPFL_GENERATORS);
#  * benchmarks/bristol/aes_128.txt — generated AES-128, FIPS-197
#    verified (circuits/aes128.py).
# Canonical files fetched here take precedence when present.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p benchmarks

# EPFL combinational benchmark suite (arithmetic + random_control BLIFs)
if [ ! -f benchmarks/epfl/adder.blif ]; then
  git clone --depth 1 https://github.com/lsils/benchmarks benchmarks/_epfl_raw
  mkdir -p benchmarks/epfl
  cp benchmarks/_epfl_raw/arithmetic/*.blif benchmarks/epfl/ || true
  cp benchmarks/_epfl_raw/random_control/*.blif benchmarks/epfl/ || true
fi

# ISCAS85 / ISCAS89 .bench netlists
mkdir -p benchmarks/iscas85 benchmarks/iscas89
for c in c17 c432 c499 c880 c1355 c1908 c2670 c3540 c5315 c6288 c7552; do
  [ -f benchmarks/iscas85/$c.bench ] || \
    wget -q -O benchmarks/iscas85/$c.bench \
      "https://raw.githubusercontent.com/jpsety/verilog_benchmark_circuits/master/$c.bench" || true
done
for s in s27 s208 s298 s344 s349 s382 s386 s400 s420 s444 s510 s526 s641 \
         s713 s820 s832 s838 s953 s1196 s1238 s1423 s1488 s1494 s5378 \
         s9234 s13207 s15850 s35932 s38417 s38584; do
  [ -f benchmarks/iscas89/$s.bench ] || \
    wget -q -O benchmarks/iscas89/$s.bench \
      "https://raw.githubusercontent.com/jpsety/verilog_benchmark_circuits/master/$s.bench" || true
done

# Bristol-fashion MPC circuits
if [ ! -f benchmarks/bristol/adder64.txt ]; then
  git clone --depth 1 https://github.com/nigelsmart/MPC-Circuits \
    benchmarks/_bristol_raw
  mkdir -p benchmarks/bristol
  cp benchmarks/_bristol_raw/*.txt benchmarks/bristol/ 2>/dev/null || true
fi

echo "done; run: python experiments/sweep.py --suite epfl"
