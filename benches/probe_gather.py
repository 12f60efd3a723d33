"""Probe: column-permutation gather strategies on the TPU.

`apply_p_right_trans_tri` (core/permutation.py) dominates pluq 32768 at
~23 s — its per-row-varying lane gather (`take_along_axis(bits, src, 1)`)
does not vectorize on the VPU (gathers along the 128-lane minor axis
lower to per-element selects).  This probe times the candidate
formulations on the real chip so the redesign is measurement-driven:

  a. sublane gather, uniform index      x[perm, :]           (packed)
  b. lane gather, uniform index         unpack -> u8[:, perm] -> pack
  c. lane gather, per-row index         take_along_axis(u8, src, 1)
  d. transpose + batched sublane gather xT_rs[idx[j,b], b, w]
     (idx varies per 8-word lane group; plus 2 packed transposes)
  e. one-hot MXU product                band @ P_packed over GF(2)

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
    key = jax.random.PRNGKey(0)
    x = jax.random.bits(key, (n, w), dtype=jnp.uint32)
    perm = jax.random.permutation(jax.random.PRNGKey(1),
                                  jnp.arange(n, dtype=jnp.int32))

    from m4ri_tpu.core.bitmatrix import BitMatrix
    from m4ri_tpu.core.transpose import transpose
    from m4ri_tpu.ops.mul import pack_bits, unpack_bits

    def report(name, fn, bytes_moved=None):
        f = jax.jit(fn)
        try:
            jax.device_get(f()[:4, :4])  # compile + warm
            r = run_timed(lambda: jax.device_get(f()[:4, :4]),
                          max_samples=8, max_time=60)
            gbs = (f"  {bytes_moved / r.mean / 1e9:7.1f} GB/s"
                   if bytes_moved else "")
            print(f"{name:34s} {r.mean*1e3:9.2f} ms{gbs}", flush=True)
        except Exception as e:
            print(f"{name:34s} FAILED: {type(e).__name__} {str(e)[:120]}",
                  flush=True)

    packed_bytes = n * w * 4

    # a. packed sublane gather, uniform
    report("a. sublane uniform (packed)", lambda: x[perm, :],
           2 * packed_bytes)

    # b. lane gather, uniform (unpack/pack included)
    def lane_uniform():
        u = unpack_bits(x, jnp.uint8)
        return pack_bits(u[:, perm])
    report("b. lane uniform (u8 unpack/pack)", lane_uniform,
           2 * packed_bytes + 2 * n * n)

    # c. lane gather, per-row varying (the current trans_tri pattern)
    rows = jnp.arange(n, dtype=jnp.int32)
    src = (perm[None, :] + rows[:, None]) % n  # row-varying, same stats

    def lane_rowvar():
        u = unpack_bits(x, jnp.uint8)
        return pack_bits(jnp.take_along_axis(u, src, axis=1))
    report("c. lane row-varying (take_along)", lane_rowvar,
           2 * packed_bytes + 2 * n * n)

    # d. transpose + batched sublane gather + transpose back
    B = w // 8  # 256-row bands -> 8-word lane groups on the transpose
    idxjb = (perm[:, None] + jnp.arange(B, dtype=jnp.int32)[None, :]) % n

    def trans_batched():
        xt = transpose(BitMatrix(x, n)).data          # (n, w)
        xt3 = xt.reshape(n, B, 8)
        g = jnp.take_along_axis(xt3, idxjb[:, :, None], axis=0)
        return transpose(BitMatrix(g.reshape(n, w), n)).data
    report("d. transpose+batched sublane", trans_batched,
           6 * packed_bytes)

    # d2. the batched sublane gather alone (no transposes)
    def batched_only():
        xt3 = x.reshape(n, B, 8)
        return jnp.take_along_axis(
            xt3, idxjb[:, :, None], axis=0).reshape(n, w)
    report("d2. batched sublane gather only", batched_only,
           2 * packed_bytes)

    # e. one-hot MXU product: full uniform column perm as scan of bands
    #    out[r, j] = parity_k x[r, k] & P[k, j], P[k, j] = (perm[j] == k)
    jj = jnp.arange(n, dtype=jnp.int32)
    pw = jnp.zeros((n, w), jnp.uint32).at[perm, jj // 32].add(
        jnp.uint32(1) << (jj % 32).astype(jnp.uint32))

    def onehot_mul():
        from m4ri_tpu.ops.pallas_mul import gf2_mul_pallas
        return gf2_mul_pallas(x, pw)
    report("e. one-hot product (pallas)", onehot_mul, 3 * packed_bytes)

    # sequential packed fori over swaps (trans_tri seq model, real op)
    from m4ri_tpu.core.permutation import apply_p_right_trans_tri_seq
    vsw = jnp.maximum(perm, rows)  # a valid v[i] >= i swap array

    def seq_fori():
        return apply_p_right_trans_tri_seq(BitMatrix(x, n), vsw).data
    t0 = time.perf_counter()
    try:
        f = jax.jit(seq_fori)
        jax.device_get(f()[:4, :4])
        print(f"f. seq fori compile+run1: {time.perf_counter()-t0:.1f} s",
              flush=True)
        r = run_timed(lambda: jax.device_get(f()[:4, :4]),
                      max_samples=5, max_time=120)
        print(f"f. seq packed fori          {r.mean*1e3:9.2f} ms", flush=True)
    except Exception as e:
        print(f"f. seq fori FAILED: {type(e).__name__} {str(e)[:120]}")


if __name__ == "__main__":
    main()
