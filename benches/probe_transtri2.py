"""Stage-level probe for the sub-banded (MXU) trans_tri at driver size.

Times the pieces of the current _trans_tri_banded_impl independently,
plus a sort-based alternative for the final band-uniform move.

Usage: python benches/probe_transtri2.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from m4ri_tpu.core import permutation as P
from m4ri_tpu.core.bitmatrix import BitMatrix, mask_padding, width_for
from m4ri_tpu.core.transpose import transpose
from m4ri_tpu.models.ple import ple
from m4ri_tpu.utils.config import WORD_BITS


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
    h, g = 256, 32
    ns = h // g
    a = mask_padding(BitMatrix(
        jax.random.bits(jax.random.PRNGKey(0), (n, width_for(n)),
                        dtype=jnp.uint32), n))
    m, _, v, _ = ple(a)
    jax.block_until_ready(m.data)

    bench("full banded     ", lambda: P._trans_tri_banded(m, v))

    nrows, ncols = m.nrows, m.ncols
    nmin = min(ncols, v.shape[0])
    Br = max(1, -(-min(nrows, nmin) // h))
    Bs = max(Br, -(-nmin // h))
    n_pad = Bs * h

    @jax.jit
    def setup(v):
        c_all = jnp.arange(ncols, dtype=jnp.int32)
        v_ext = jnp.concatenate([v[:nmin].astype(jnp.int32),
                                 jnp.arange(nmin, n_pad, dtype=jnp.int32)])
        base = (jnp.arange(Bs, dtype=jnp.int32) * h)[:, None]
        jj = jnp.arange(h, dtype=jnp.int32)[None, :]
        vb = v_ext.reshape(Bs, h)
        in_band = vb < base + h
        w_slots = jnp.concatenate(
            [jnp.where(in_band, vb - base, h + jj),
             jnp.broadcast_to(jnp.arange(h, 2 * h, dtype=jnp.int32)[None, :],
                              (Bs, h))], axis=1)
        sb = jnp.concatenate(
            [base + jj, jnp.where(in_band, jnp.int32(ncols), vb)], axis=1)
        sb = jnp.where(sb < ncols, sb, jnp.int32(ncols))
        jl = jnp.arange(g, dtype=jnp.int32)
        send = (jnp.arange(ns, dtype=jnp.int32)[None, :, None] + 1) * g
        wj = w_slots[:, :h].reshape(Bs, ns, g)
        in_sub = wj < send
        wl = jnp.concatenate(
            [jnp.where(in_sub, wj - (send - g), g + jl[None, None, :]),
             jnp.broadcast_to(jnp.arange(g, 2 * g, dtype=jnp.int32),
                              (Bs, ns, g))], axis=2)
        tslot = jnp.concatenate(
            [jnp.broadcast_to(send - g + jl[None, None, :], (Bs, ns, g)),
             jnp.where(in_sub, jnp.int32(2 * h), wj)], axis=2)
        return sb, wl, tslot

    sb, wl, tslot = bench("setup           ", lambda: setup(v))

    folds = jax.jit(lambda wl: P._band_suffix_folds(wl.reshape(Bs * ns, 2 * g)))
    lf = bench("sub folds       ", lambda: folds(wl))

    @jax.jit
    def compose(lf, tslot):
        ident = jnp.arange(2 * h, dtype=jnp.int32)
        lf_full = lf[:, 0].reshape(Bs, ns, 2 * g)
        t_src = jnp.take_along_axis(tslot, lf_full, axis=2)
        bidx = jnp.arange(Bs, dtype=jnp.int32)[:, None, None]
        sidx = jnp.arange(ns, dtype=jnp.int32)[None, :, None]
        F = jnp.broadcast_to(ident[None, None, :], (Bs, ns, 2 * h)).at[
            bidx, sidx, tslot].set(t_src, mode="drop")
        u_cur = jnp.broadcast_to(ident[None, :], (Bs, 2 * h))
        u_list = [None] * ns
        for s in range(ns - 1, -1, -1):
            u_list[s] = u_cur
            u_cur = jnp.take_along_axis(F[:, s], u_cur, axis=1)
        return u_cur, jnp.stack(u_list, axis=1)

    f_full, U = bench("U compose       ", lambda: compose(lf, tslot))

    @jax.jit
    def g_chain(sb, f_full):
        c_all = jnp.arange(ncols, dtype=jnp.int32)
        src_cols = jnp.take_along_axis(sb, f_full, axis=1)
        g_cur = c_all
        g_list = [None] * Br
        for b in range(Bs - 1, -1, -1):
            if b < Br:
                g_list[b] = g_cur
            f_col = c_all.at[sb[b]].set(src_cols[b], mode="drop")
            g_cur = f_col[g_cur]
        return jnp.stack(g_list, axis=1)

    gidx = bench("G chain         ", lambda: g_chain(sb, f_full))

    @jax.jit
    def extract(m, sb):
        xt = transpose(m).data
        wr_band = Br * (h // WORD_BITS)
        xt3 = xt[:, :wr_band].reshape(ncols, Br, h // WORD_BITS)
        sbc = jnp.minimum(sb[:Br], ncols - 1)
        e_pk = jnp.take_along_axis(xt3, sbc.T[:, :, None], axis=0)
        shifts = jnp.arange(WORD_BITS, dtype=jnp.uint32)
        e_bits = ((e_pk[:, :, :, None] >> shifts[None, None, None, :]) &
                  jnp.uint32(1)).astype(jnp.uint8)
        e_bits = e_bits.reshape(2 * h, Br, h).transpose(1, 2, 0)
        return xt3, e_bits.reshape(Br, ns, g, 2 * h)

    xt3, e4 = bench("transp+extract  ", lambda: extract(m, sb))

    @jax.jit
    def correct(e4, U, tslot, lf):
        slot_r = jnp.arange(2 * h, dtype=jnp.int32)
        lf_rows = lf[:, 1:].reshape(Bs, ns, g, 2 * g)[:Br]
        oh_t = (tslot[:Br, :, None, :] ==
                slot_r[None, None, :, None]).astype(jnp.bfloat16)
        e_t = jnp.einsum("bsjq,bsqt->bsjt", e4.astype(jnp.bfloat16), oh_t,
                         preferred_element_type=jnp.float32).astype(jnp.int8)
        e_tf = jnp.take_along_axis(e_t, lf_rows, axis=3)
        delta = (e_tf - e_t).astype(jnp.bfloat16)
        oh_u = (U[:Br, :, None, :] ==
                slot_r[None, None, :, None]).astype(jnp.bfloat16)
        oh_d = (U[:Br, :, None, :] ==
                tslot[:Br, :, :, None]).astype(jnp.bfloat16)
        corr = (jnp.einsum("bsjq,bsqp->bsjp", e4.astype(jnp.bfloat16), oh_u,
                           preferred_element_type=jnp.float32) +
                jnp.einsum("bsjt,bstp->bsjp", delta, oh_d,
                           preferred_element_type=jnp.float32))
        corrected = corr.astype(jnp.uint8).reshape(Br, h, 2 * h)
        shifts = jnp.arange(WORD_BITS, dtype=jnp.uint32)
        cpk = corrected.transpose(0, 2, 1).reshape(
            Br, 2 * h, h // WORD_BITS, WORD_BITS).astype(jnp.uint32)
        return jnp.sum(cpk << shifts[None, None, None, :], axis=-1,
                       dtype=jnp.uint32)

    cpk = bench("correct (MXU)   ", lambda: correct(e4, U, tslot, lf))

    @jax.jit
    def scatter_only(xt3, cpk, sb):
        return xt3.at[sb[:Br], jnp.arange(Br, dtype=jnp.int32)[:, None],
                      :].set(cpk, mode="drop")

    mid3 = bench("scatter         ", lambda: scatter_only(xt3, cpk, sb))

    f_gather = jax.jit(lambda mid3, gidx: jnp.take_along_axis(
        mid3, gidx[:, :, None], axis=0))
    r_g = bench("final gather    ", lambda: f_gather(mid3, gidx))

    @jax.jit
    def final_sort(mid3, gidx):
        invg = jnp.zeros_like(gidx).at[
            gidx, jnp.arange(Br, dtype=jnp.int32)[None, :]].set(
            jnp.broadcast_to(jnp.arange(ncols, dtype=jnp.int32)[:, None],
                             gidx.shape))
        ops = (invg,) + tuple(mid3[:, :, i] for i in range(mid3.shape[2]))
        res = jax.lax.sort(ops, dimension=0, num_keys=1)
        return jnp.stack(res[1:], axis=2)

    r_s = bench("final via sort  ", lambda: final_sort(mid3, gidx))
    assert np.array_equal(np.asarray(r_g), np.asarray(r_s)), "sort mismatch"

    @jax.jit
    def back(out3):
        out_t = out3.reshape(ncols, Br * (h // WORD_BITS))
        return transpose(BitMatrix(out_t, nrows))

    bench("transpose back  ", lambda: back(r_g))


if __name__ == "__main__":
    main()
