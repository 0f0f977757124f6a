#!/bin/bash
# Pre-map the programs the r5 TPU chain executes (CPU-side; run BEFORE the
# chain so the TPU process only loads .lbf files).  Sweep file naming.
set -u
cd "$(dirname "$0")/.."
CLI="python -m tfhe_fbs_map_tpu.frontend.cli"
map() { # out_lbf bench type p mapper extra...
  local out=$1 bench=$2 type=$3 p=$4 mapper=$5; shift 5
  [ -s "$out" ] && { echo "skip $out"; return; }
  $CLI "$bench" --type "$type" --fbs_size "$p" --mapper "$mapper" \
    --output_lbf "$out" "$@" > "${out%.lbf}.log" 2>&1 \
    && echo "done $out" || echo "FAIL $out"
}
I85=benchmarks/iscas85; I89=benchmarks/iscas89; O85=outputs/iscas85; O89=outputs/iscas89
map $O85/c17_3_search.lbf     $I85/c17.bench    bench 3  search --opt &
map $O85/c432r_4_search.lbf   $I85/c432r.bench  bench 4  search --opt &
wait
map $O85/c880r_4_search.lbf   $I85/c880r.bench  bench 4  search --opt &
map $O85/c1908r_3_search.lbf  $I85/c1908r.bench bench 3  search --opt &
wait
map $O85/c1355r_2_search.lbf  $I85/c1355r.bench bench 2  search --opt &
map $O85/c7552r_4_search.lbf  $I85/c7552r.bench bench 4  search --opt &
wait
map $O85/c6288r_4_search.lbf  $I85/c6288r.bench bench 4  search --opt &
map $O85/c499r_3_search.lbf   $I85/c499r.bench  bench 3  search --opt &
wait
map $O85/c2670r_4_searchdc.lbf $I85/c2670r.bench bench 4 search+dc --opt &
map $O85/c3540r_10_searchdc.lbf $I85/c3540r.bench bench 10 search+dc --opt &
wait
map $O89/s27_4_search.lbf     $I89/s27.bench    bench 4  search &
map $O89/s1423r_3_search.lbf  $I89/s1423r.bench bench 3  search &
wait
map $O89/s838r_10_search.lbf  $I89/s838r.bench  bench 10 search &
map $O89/s9234r_3_search.lbf  $I89/s9234r.bench bench 3  search &
wait
map $O89/s5378r_3_search.lbf  $I89/s5378r.bench bench 3  search &
map $O89/s9234r_22_search.lbf $I89/s9234r.bench bench 22 search &
wait
map $O89/s1423r_18_search.lbf $I89/s1423r.bench bench 18 search &
map $O89/s13207r_3_search.lbf $I89/s13207r.bench bench 3 search &
wait
map $O89/s13207r_4_search.lbf $I89/s13207r.bench bench 4 search &
map $O89/s15850r_3_search.lbf $I89/s15850r.bench bench 3 search &
wait
map $O89/s15850r_4_search.lbf $I89/s15850r.bench bench 4 search
echo "premap done"
