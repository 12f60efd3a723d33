#!/bin/bash
# Round-3 follow-up probes (run strictly AFTER tpu_r3_run.sh finishes):
#   - mul-4096 sustained gap deep-dive (tile sweep + XLA vs kernel)
#   - int4 MXU feasibility (2x the GF(2) mul roofline if it runs 2x int8)
#   - wider panel sweep (nb=512 halves per-panel glue at the driver sizes)
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r3}
mkdir -p "$LOG"
run() { name=$1; tmo=$2; shift 2
  echo "=== $name: $* ($(date +%T))"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "--- $name rc=$? ($(date +%T)) tail:"; tail -4 "$LOG/$name.log"; }

run probe_int4 1800 python benches/probe_int4.py 8192
run ple_breakdown 3600 python benches/probe_ple_breakdown.py 32768 256 512
run probe_mul4096 3600 python benches/probe_mul4096.py 4096
run tune_panel_wide 5400 python benches/tune_panel.py 32768 0 256:512 512:512 512:1024 384:768
run tune_panel_16384 3600 python benches/tune_panel.py 16384 0 256:512 512:512 512:1024
echo "=== R3 FOLLOWUP DONE ($(date +%T))"
