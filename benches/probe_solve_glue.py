"""solve_left glue breakdown at 32768 / B=256 (VERDICT r5 #9).

solve_left = block_factor + [apply_p_left, trsm_lower_left (narrow B),
trsm_upper_left (slot space, narrow B), pivot-column scatter].  The
driver measured 0.218-0.228 s vs 0.166 s bare PLE; this times each glue
stage as its own jitted program to attribute the ~30% overhead.

Usage: python benches/probe_solve_glue.py [n] [bcols]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from m4ri_tpu.core.bitmatrix import BitMatrix, mask_padding, width_for
from m4ri_tpu.core.permutation import apply_p_left
from m4ri_tpu.models import solve as sol
from m4ri_tpu.models.ple import block_factor
from m4ri_tpu.models.triangular import trsm_lower_left, trsm_upper_left


def bench(tag, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        x = jax.tree_util.tree_leaves(out)[0]
        jax.device_get(x.ravel()[:4])
        ts.append(time.perf_counter() - t0)
    print(f"{tag}: {min(ts):.4f} s", flush=True)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    bc = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    a = mask_padding(BitMatrix(
        jax.random.bits(jax.random.PRNGKey(0), (n, width_for(n)),
                        dtype=jnp.uint32), n))
    b = mask_padding(BitMatrix(
        jax.random.bits(jax.random.PRNGKey(1), (n, width_for(bc)),
                        dtype=jnp.uint32), bc))

    data, p, q, r = bench("factor (PLE)    ",
                          lambda a_: block_factor(a_, preserve_l=True), a)

    bench("solve_from_fact ",
          jax.jit(lambda d, p_, q_, r_, b_: sol._solve_from_factors(
              d, p_, q_, r_, b_, n, n, from_pivot_cols=True)),
          data, p, q, r, b)

    m = n
    rmax = n

    @jax.jit
    def stage_l(data, q, r):
        return sol._packed_l(data, q, r, m, rmax, n, True)

    lfull = bench("packed_l select ", stage_l, data, q, r)

    bp = bench("apply_p_left    ", jax.jit(apply_p_left), b, p)

    y = bench("trsm_lower (B256)", jax.jit(trsm_lower_left), lfull, bp)

    @jax.jit
    def stage_u(data, q, r):
        return sol._packed_upiv(data[:rmax], q, r, rmax, n, True)

    upiv = bench("packed_upiv sel ", stage_u, data, q, r)

    iidx = jnp.arange(m, dtype=jnp.int32)
    kidx = jnp.arange(rmax, dtype=jnp.int32)

    @jax.jit
    def stage_back(upiv, y, r):
        ydata = y.data[:rmax] * (kidx < r)[:, None].astype(jnp.uint32)
        return trsm_upper_left(upiv, BitMatrix(ydata, b.ncols))

    z = bench("trsm_upper (slot)", stage_back, upiv, y, r)

    @jax.jit
    def stage_scatter(z, q, r):
        zmask = z.data * (kidx < r)[:, None].astype(jnp.uint32)
        idx = jnp.where(kidx < r, q[:rmax], jnp.int32(n))
        x = jnp.zeros((n, width_for(b.ncols)), jnp.uint32)
        return x.at[idx].set(zmask, mode="drop")

    bench("pivot scatter   ", stage_scatter, z, q, r)


if __name__ == "__main__":
    main()
