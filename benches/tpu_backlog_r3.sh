#!/bin/bash
# Round-3 TPU measurement backlog — run when the axon tunnel is alive.
# ONE TPU process at a time; stages run strictly serialized.  Each stage
# logs to $LOG.  Abort a hung stage with its timeout, never pkill.
#
# Interpretation guide (VERDICT r2):
#   #1  BENCH_r03-grade numbers for every driver config
#   #2  TPU-marked pytest subset on hardware
#   #3  dyn-Schur ablation (M4RI_TPU_SCHUR_DYN=1 vs 0) -> flip default
#   #4  bench_m4rm without OOM (blocked tables) + speed check
#   #6  autotune winners (bench.py warmup now does this; also tune_panel)
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_backlog_r3}
mkdir -p "$LOG"
run() { name=$1; tmo=$2; shift 2
  echo "=== $name: $*"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "--- $name rc=$? (tail)"; tail -3 "$LOG/$name.log"; }

# 0. sanity: tiny jit must complete in seconds
run sanity 120 python -c "import jax,jax.numpy as jnp; print(jax.devices()); print(jax.device_get(jax.jit(lambda x:x+1)(jnp.ones((8,128),jnp.int32)))[0,0])"

# 1. headline mul (driver metric) + autotune warmup; also 16384/65536
run bench_mul_4096  1800 python bench.py 4096
run bench_mul_16384 1800 python benches/bench_multiplication.py 16384
run bench_mul_65536 3600 python benches/bench_multiplication.py 65536

# 2. TPU-marked pytest subset (production Mosaic lowering evidence)
run tpu_pytest 3600 env M4RI_TPU_TEST_PLATFORM=tpu python -m pytest tests/test_pallas.py -q -k tpu

# 3. dyn-Schur ablation at the driver sizes (watch COMPILE time; if the
#    Mosaic compile blows up, record and keep schur_dyn=0)
run ple_32768_base 3600 python benches/bench_ple.py 32768 32768 ple
run ple_32768_dyn  3600 env M4RI_TPU_SCHUR_DYN=1 python benches/bench_ple.py 32768 32768 ple
run rank_16384_base 1800 python benches/bench_rank.py 16384
run rank_16384_dyn  1800 env M4RI_TPU_SCHUR_DYN=1 python benches/bench_rank.py 16384

# 4. the rest of the driver configs
run rref_16384   1800 python benches/bench_elimination.py 16384
run solve_32768  3600 python benches/bench_solve.py 32768
run trsm_ul      1800 python benches/bench_trsm.py 32768 32768 upper left
run trsm_ll      1800 python benches/bench_trsm.py 32768 32768 lower left
run trsm_ur      1800 python benches/bench_trsm.py 32768 32768 upper right
run trsm_lr      1800 python benches/bench_trsm.py 32768 32768 lower right
run invert_16384 1800 python benches/bench_invert.py 16384

# 5. M4RM (blocked tables — must not OOM at 16384)
run m4rm_4096  1800 python benches/bench_multiplication.py 4096 m4rm
run m4rm_16384 3600 python benches/bench_multiplication.py 16384 m4rm

# 6. panel tuning sweep (persisted autotune winners)
run tune_panel 3600 python benches/tune_panel.py 32768

echo "=== DONE; update RESULTS.md round-3 column from $LOG/*.log"
