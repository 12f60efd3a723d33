"""Probe: column-permutation gather strategies on the TPU.

`apply_p_right_trans_tri` (core/permutation.py) dominates pluq 32768 at
~23 s — its per-row-varying lane gather (`take_along_axis(bits, src, 1)`)
does not vectorize on the VPU (gathers along the 128-lane minor axis
lower to per-element selects).  This probe times the candidate
formulations on the real chip so the redesign is measurement-driven.
All operands are passed as jit ARGUMENTS (a closure-captured index
matrix becomes a multi-GB inline constant that the remote-compile
tunnel cannot ship).

  a. sublane gather, uniform index      x[perm, :]           (packed)
  d. transpose + banded sublane gather  xT_rs[idx[j,b], b, w]
     (index varies per 8-word lane group; the real op's structure)
  e. one-hot MXU product                x @ P_packed over GF(2)
  f. sequential packed fori over swaps  (the seq oracle as an engine)

Usage: python benches/probe_gather.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from harness import run_timed

import jax
import jax.numpy as jnp


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    w = n // 32
    x = jax.random.bits(jax.random.PRNGKey(0), (n, w), dtype=jnp.uint32)
    perm = jax.random.permutation(jax.random.PRNGKey(1),
                                  jnp.arange(n, dtype=jnp.int32))

    from m4ri_tpu.core.bitmatrix import BitMatrix
    from m4ri_tpu.core.transpose import transpose

    def report(name, fn, *args, bytes_moved=None):
        f = jax.jit(fn)
        try:
            jax.device_get(f(*args)[:4, :4])  # compile + warm
            r = run_timed(lambda: jax.device_get(f(*args)[:4, :4]),
                          max_samples=8, max_time=60)
            gbs = (f"  {bytes_moved / r.mean / 1e9:7.1f} GB/s"
                   if bytes_moved else "")
            print(f"{name:34s} {r.mean*1e3:9.2f} ms{gbs}", flush=True)
        except Exception as e:
            print(f"{name:34s} FAILED: {type(e).__name__} {str(e)[:120]}",
                  flush=True)

    packed_bytes = n * w * 4

    # a. packed sublane gather, uniform
    report("a. sublane uniform (packed)", lambda xx, pp: xx[pp, :], x, perm,
           bytes_moved=2 * packed_bytes)

    # d. transpose + banded sublane gather + transpose back: one gather
    #    index per (column j, 256-row band b) — the real op's structure.
    B = w // 8
    idxjb = (perm[:, None] + jnp.arange(B, dtype=jnp.int32)[None, :]) % n

    def trans_banded(xx, idx):
        xt = transpose(BitMatrix(xx, n)).data          # (n, w)
        xt3 = xt.reshape(n, B, 8)
        g = jnp.take_along_axis(xt3, idx[:, :, None], axis=0)
        return transpose(BitMatrix(g.reshape(n, w), n)).data
    report("d. transpose+banded sublane", trans_banded, x, idxjb,
           bytes_moved=6 * packed_bytes)

    # d2. the banded sublane gather alone (no transposes)
    def banded_only(xx, idx):
        xt3 = xx.reshape(n, B, 8)
        return jnp.take_along_axis(
            xt3, idx[:, :, None], axis=0).reshape(n, w)
    report("d2. banded sublane gather only", banded_only, x, idxjb,
           bytes_moved=2 * packed_bytes)

    # e. one-hot MXU product: out[r, j] = parity_k x[r, k] & P[k, j],
    #    P[k, j] = (perm[j] == k), built packed via scatter-add.
    jj = jnp.arange(n, dtype=jnp.int32)
    pw = jnp.zeros((n, w), jnp.uint32).at[perm, jj // 32].add(
        jnp.uint32(1) << (jj % 32).astype(jnp.uint32))

    def onehot_mul(xx, pp):
        from m4ri_tpu.ops.pallas_mul import gf2_mul_pallas
        return gf2_mul_pallas(xx, pp)
    report("e. one-hot product (pallas)", onehot_mul, x, pw,
           bytes_moved=3 * packed_bytes)

    # f. sequential packed fori over swaps (trans_tri seq model, real op)
    from m4ri_tpu.core.permutation import apply_p_right_trans_tri_seq
    rows = jnp.arange(n, dtype=jnp.int32)
    vsw = jnp.maximum(perm, rows)  # a valid v[i] >= i swap array

    def seq_fori(xx, vv):
        return apply_p_right_trans_tri_seq(BitMatrix(xx, n), vv).data
    t0 = time.perf_counter()
    try:
        f = jax.jit(seq_fori)
        jax.device_get(f(x, vsw)[:4, :4])
        print(f"f. seq fori compile+run1: {time.perf_counter()-t0:.1f} s",
              flush=True)
        r = run_timed(lambda: jax.device_get(f(x, vsw)[:4, :4]),
                      max_samples=5, max_time=120)
        print(f"f. seq packed fori          {r.mean*1e3:9.2f} ms", flush=True)
    except Exception as e:
        print(f"f. seq fori FAILED: {type(e).__name__} {str(e)[:120]}")

    # g. current production op, for the before/after record
    from m4ri_tpu.core.permutation import apply_p_right_trans_tri

    def current(xx, vv):
        return apply_p_right_trans_tri(BitMatrix(xx, n), vv).data
    report("g. current trans_tri (lane TAA)", current, x, vsw)


if __name__ == "__main__":
    main()
