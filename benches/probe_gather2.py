"""Gather-formulation speed-of-light probes for the trans_tri rewrite.

Measures, at driver scale, the raw rates of the index-bound primitives
the banded trans_tri is built from, plus candidate replacements:

  a. plain row gather   data[perm, :]        (nrows x 1024 words)
  b. banded row gather  take_along_axis((n, Br, wb), idx(n, Br, 1), axis=0)
     -- the current final-stage formulation
  c. sort-based permutation of the same banded payload
  d. lane gather (16.8M elems over 512 lanes) vs one-hot f32 MXU matmul

Usage: python benches/probe_gather2.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def bench(tag, fn, reps=3):
    out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        x = jax.tree_util.tree_leaves(out)[0]
        jax.device_get(x.ravel()[:4])
        ts.append(time.perf_counter() - t0)
    print(f"{tag}: {min(ts):.4f} s", flush=True)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    w = n // 32
    Br = n // 256
    wb = 8
    key = jax.random.PRNGKey(0)
    data = jax.random.bits(key, (n, w), dtype=jnp.uint32)
    perm = jax.random.permutation(jax.random.PRNGKey(1), n).astype(jnp.int32)
    gidx = jax.vmap(lambda k: jax.random.permutation(k, n), out_axes=1)(
        jax.random.split(jax.random.PRNGKey(2), Br)).astype(jnp.int32)
    data3 = data[:, : Br * wb].reshape(n, Br, wb)

    # a. plain row gather, uniform index across the row
    bench("row gather 134MB  ", jax.jit(lambda d, p: d[p, :]).lower(
        data, perm).compile().__call__ if False else
        (lambda: jax.jit(lambda d, p: d[p, :])(data, perm)))

    # b. banded gather: index varies per (row, band); 32B units
    f_banded = jax.jit(lambda d, g: jnp.take_along_axis(
        d, g[:, :, None], axis=0))
    bench("banded gather     ", lambda: f_banded(data3, gidx))

    # c. the same move via one sort per band: sort (key=inverse index)
    #    carrying the payload words as co-sorted operands
    def via_sort(d, g):
        # out[c, b] = d[g[c, b], b] ; scatter-form: out[invg[r], b] = d[r, b]
        # sort rows by invg per band == sort (g's argsort) ... one sort,
        # keys (n, Br) int32, payload d (n, Br, wb) -> co-sort along axis 0
        invg = jnp.zeros_like(g).at[g, jnp.arange(g.shape[1])[None, :]].set(
            jnp.broadcast_to(jnp.arange(g.shape[0])[:, None], g.shape))
        ops = (invg,) + tuple(d[:, :, i] for i in range(d.shape[2]))
        res = jax.lax.sort(ops, dimension=0, num_keys=1)
        return jnp.stack(res[1:], axis=2)

    f_sort = jax.jit(via_sort)
    r_b = f_banded(data3, gidx)
    r_c = f_sort(data3, gidx)
    import numpy as np
    assert np.array_equal(np.asarray(r_b), np.asarray(r_c)), "sort mismatch"
    bench("banded via sort   ", lambda: f_sort(data3, gidx))

    # d. lane gather vs one-hot f32 matmul at the folds' Ag shape
    Bn, R, S = n // 256, 257, 512
    A = jax.random.randint(jax.random.PRNGKey(3), (Bn, R, S), 0, 513,
                           dtype=jnp.int32)
    pathid = jax.vmap(lambda k: jax.random.permutation(k, S))(
        jax.random.split(jax.random.PRNGKey(4), Bn)).astype(jnp.int32)

    f_lane = jax.jit(lambda A, p: jnp.take_along_axis(
        A, jnp.broadcast_to(p[:, None, :], A.shape), axis=2))

    def onehot_mm(A, p):
        oh = (p[:, None, :] == jnp.arange(S, dtype=jnp.int32)[None, :, None]
              ).astype(jnp.float32)  # oh[b, q, p'] = [pathid[b,p']==q]
        return jnp.einsum("brq,bqp->brp", A.astype(jnp.float32), oh,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST
                          ).astype(jnp.int32)

    f_mm = jax.jit(onehot_mm)
    r_l = f_lane(A, pathid)
    r_m = f_mm(A, pathid)
    assert np.array_equal(np.asarray(r_l), np.asarray(r_m)), "mm mismatch"
    bench("lane gather 16.8M ", lambda: f_lane(A, pathid))
    bench("one-hot f32 matmul", lambda: f_mm(A, pathid))

    # e. uint8 bit payload gather (the correct-lane shape) vs bf16 matmul
    Bc, h = n // 256, 256
    e = jax.random.randint(jax.random.PRNGKey(5), (Bc, h, 2 * h), 0, 2,
                           dtype=jnp.uint8)
    # per-(b, sub-band of 32 rows) uniform permutation
    g_sub = 32
    ns = h // g_sub
    U = jax.vmap(lambda k: jax.random.permutation(k, 2 * h))(
        jax.random.split(jax.random.PRNGKey(6), Bc * ns)
    ).astype(jnp.int32).reshape(Bc, ns, 2 * h)
    idx_rows = jnp.repeat(U, g_sub, axis=1)  # (Bc, h, 2h)

    f_lane8 = jax.jit(lambda e, i: jnp.take_along_axis(e, i, axis=2))

    def onehot_bf16(e, U):
        oh = (U[:, :, None, :] == jnp.arange(2 * h, dtype=jnp.int32)[
            None, None, :, None]).astype(jnp.bfloat16)  # (Bc, ns, q, p)
        e4 = e.reshape(Bc, ns, g_sub, 2 * h).astype(jnp.bfloat16)
        out = jnp.einsum("bsjq,bsqp->bsjp", e4, oh,
                         preferred_element_type=jnp.float32)
        return out.astype(jnp.uint8).reshape(Bc, h, 2 * h)

    f_mm8 = jax.jit(onehot_bf16)
    r_l8 = f_lane8(e, idx_rows)
    r_m8 = f_mm8(e, U)
    assert np.array_equal(np.asarray(r_l8), np.asarray(r_m8)), "mm8 mismatch"
    bench("u8 lane gather    ", lambda: f_lane8(e, idx_rows))
    bench("u8 one-hot bf16 mm", lambda: f_mm8(e, U))


if __name__ == "__main__":
    main()
