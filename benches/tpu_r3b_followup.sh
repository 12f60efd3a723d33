#!/bin/bash
# Round-3 follow-up TPU runs (after tpu_r3_run.sh):
#   1. col-skip ablation at 32768 (decides the size gate; at 16384 the
#      switch overhead LOST to the skipped traffic: 0.0847 vs 0.0801)
#   2. gather-strategy probe for the trans_tri/pluq fix (23.6 s bug)
#   3. mul-4096 sustained-gap deep dive (tile sweep, XLA vs kernel)
#   4. int4 MXU feasibility (2x roofline if int4 dots run 2x int8)
#   5. wider panel sweep (nb=512 halves per-panel glue)
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r3}
mkdir -p "$LOG"
run() { name=$1; tmo=$2; shift 2
  echo "=== $name: $* ($(date +%T))"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "--- $name rc=$? ($(date +%T)) tail:"; tail -4 "$LOG/$name.log"; }

run ple_32768_noskip 3600 env M4RI_TPU_SCHUR_COL_SKIP=0 python benches/bench_ple.py 32768 32768 ple
run rank_neither 1800 env M4RI_TPU_USE_PALLAS_PANEL_POST=0 M4RI_TPU_SCHUR_COL_SKIP=0 python benches/bench_rank.py 16384
run probe_gather 3600 python benches/probe_gather.py 32768
run probe_mul4096 3600 python benches/probe_mul4096.py 4096
run probe_int4 1800 python benches/probe_int4.py 8192
run tune_panel_wide 5400 python benches/tune_panel.py 32768 0 256:512 512:512 512:1024 384:768
echo "=== R3B FOLLOWUP DONE ($(date +%T))"
