#!/bin/bash
# Round-3 consolidated TPU measurement run (merges tpu_backlog_r3.sh +
# tpu_backlog_r3c.sh with the CLI fixes).  Priority-ordered: if the tunnel
# dies mid-run, the most important evidence lands first.
#   1. driver bench number (VERDICT r2 #1)
#   2. TPU-marked pytest subset (VERDICT r2 #2)
#   3. dyn-Schur correctness probe + ablation (r3 gate decision)
#   4. every driver config (PLE/rank/RREF/solve/TRSM x4/invert)
#   5. big muls through the production dispatch, M4RM blocked tables
#   6. rank regression ablation + panel tuning sweep
# ONE TPU process at a time; stages strictly serialized; never pkill.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r3}
mkdir -p "$LOG"
run() { name=$1; tmo=$2; shift 2
  echo "=== $name: $* ($(date +%T))"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "--- $name rc=$? ($(date +%T)) tail:"; tail -3 "$LOG/$name.log"; }

# 0. sanity: tiny jit must complete in seconds
run sanity 180 python -c "import jax,jax.numpy as jnp; print(jax.devices()); print(jax.device_get(jax.jit(lambda x:x+1)(jnp.ones((8,128),jnp.int32)))[0,0])"

# 1. the driver metric (includes warmup autotune for the 4096 bucket)
run bench_mul_4096 2400 python bench.py 4096

# 2. TPU-marked pytest subset: production Mosaic lowering evidence
run tpu_pytest 3600 env M4RI_TPU_TEST_PLATFORM=tpu python -m pytest tests/test_pallas.py -q

# 3. dyn-Schur: hardware correctness probe, then the ablation
run dyn_probe 900 python benches/probe_dyn_schur.py
run ple_32768_base 3600 python benches/bench_ple.py 32768 32768 ple
run ple_32768_dyn 3600 env M4RI_TPU_SCHUR_DYN=1 python benches/bench_ple.py 32768 32768 ple
run rank_16384_base 1800 python benches/bench_rank.py 16384
run rank_16384_dyn 1800 env M4RI_TPU_SCHUR_DYN=1 python benches/bench_rank.py 16384

# 4. the rest of the driver configs
run rref_16384 1800 python benches/bench_elimination.py 16384
run solve_32768 3600 python benches/bench_solve.py 32768
run trsm_ul 1800 python benches/bench_trsm.py 32768 32768 1 1
run trsm_ll 1800 python benches/bench_trsm.py 32768 32768 0 1
run trsm_ur 1800 python benches/bench_trsm.py 32768 32768 1 0
run trsm_lr 1800 python benches/bench_trsm.py 32768 32768 0 0
run invert_16384 1800 python benches/bench_invert.py 16384
run pluq_32768 3600 python benches/bench_ple.py 32768 32768 pluq

# 5. big muls through the production dispatch + M4RM blocked tables
run mul_disp_16384 3600 python benches/bench_multiplication.py 16384 dispatch
run mul_disp_65536 5400 python benches/bench_multiplication.py 65536 dispatch
run m4rm_4096 1800 python benches/bench_multiplication.py 4096 m4rm
run m4rm_16384 3600 python benches/bench_multiplication.py 16384 m4rm

# 6. rank ablation (isolate pallas_post / col-skip) + panel tuning sweep
run rank_nopost 1800 env M4RI_TPU_USE_PALLAS_PANEL_POST=0 python benches/bench_rank.py 16384
run rank_noskip 1800 env M4RI_TPU_SCHUR_COL_SKIP=0 python benches/bench_rank.py 16384
run sparse_16384 1800 python benches/bench_elimination_sparse.py 16384
run tune_panel 5400 python benches/tune_panel.py 32768

echo "=== R3 RUN DONE ($(date +%T)); update RESULTS.md from $LOG/*.log"
