#!/bin/bash
# Round-3 follow-up TPU runs (after tpu_backlog_r3.sh):
#   A. production-dispatch mul at 16384/65536 (the first backlog ran the
#      raw mxu engine; dispatch engages depth-2 Strassen)
#   B. dyn-Schur retest after the double-wait semaphore fix
#   C. rank-16384 regression ablation (0.1368 s vs round-2 0.0902 s):
#      isolate pallas_post / col-skip / both
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_backlog_r3}
mkdir -p "$LOG"
run() { name=$1; tmo=$2; shift 2
  echo "=== $name: $*"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "--- $name rc=$? (tail)"; tail -3 "$LOG/$name.log"; }

# A0. re-autotune with the fixed chain-based timing (the morning run's
# winner was picked under single-dispatch RPC noise), then the driver bench
run retune 3600 python -c "
import os
os.remove(os.path.expanduser('~/.cache/m4ri_tpu/autotune.json'))
from m4ri_tpu.ops.pallas_mul import autotune
print('4096:', autotune(4096, 4096, 4096, reps=3))
print('16384:', autotune(16384, 16384, 16384, reps=2))
"
run bench_mul_4096b 1800 python bench.py 4096

# A. dispatch mul
run mul_disp_16384 3600 python benches/bench_multiplication.py 16384 dispatch
run mul_disp_65536 3600 python benches/bench_multiplication.py 65536 dispatch

# B. dyn-Schur on hardware: correctness probe first, then benches
run dyn_probe 900 python -c "
import jax, jax.numpy as jnp
from m4ri_tpu.ops.pallas_schur import gf2_schur_update, gf2_schur_update_dyn
k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
m, nw, kw = 1024, 256, 8
c = jax.random.bits(k1, (m, nw), dtype=jnp.uint32)
lp = jax.random.bits(k2, (m, kw), dtype=jnp.uint32)
up = jax.random.bits(k3, (kw*32, nw), dtype=jnp.uint32)
import numpy as np
for r0, c0w in [(0,0),(256,128),(300,130),(768,250)]:
    lpm = lp * (jnp.arange(m)[:,None] >= r0).astype(jnp.uint32)
    upm = up * (jnp.arange(nw)[None,:] >= c0w).astype(jnp.uint32)
    ref = gf2_schur_update(c, lpm, upm, r0, c0w, tm=256, tnw=128)
    dyn = gf2_schur_update_dyn(c, lpm, upm, r0, c0w, tm=256, tnw=128)
    ok = bool(jnp.all(ref == dyn))
    print('r0', r0, 'c0w', c0w, 'ok', ok)
    assert ok
print('DYN PROBE OK')
"
run ple_32768_dyn2 3600 env M4RI_TPU_SCHUR_DYN=1 python benches/bench_ple.py 32768 32768 ple
run rank_16384_dyn2 1800 env M4RI_TPU_SCHUR_DYN=1 python benches/bench_rank.py 16384

# B2. TRSM x4 (the first backlog passed string args; the CLI takes ints)
run trsm_ul2 1800 python benches/bench_trsm.py 32768 32768 1 1
run trsm_ll2 1800 python benches/bench_trsm.py 32768 32768 0 1
run trsm_ur2 1800 python benches/bench_trsm.py 32768 32768 1 0
run trsm_lr2 1800 python benches/bench_trsm.py 32768 32768 0 0

# C. rank regression ablation (rank_16384_base ran right after a worker
# crash; re-measure base on a healthy worker first)
run rank_base2 1800 python benches/bench_rank.py 16384
run rank_nopost 1800 env M4RI_TPU_USE_PALLAS_PANEL_POST=0 python benches/bench_rank.py 16384
run rank_noskip 1800 env M4RI_TPU_SCHUR_COL_SKIP=0 python benches/bench_rank.py 16384
run rank_neither 1800 env M4RI_TPU_USE_PALLAS_PANEL_POST=0 M4RI_TPU_SCHUR_COL_SKIP=0 python benches/bench_rank.py 16384

echo "=== R3C DONE"
