"""Stage-level A/B for the banded trans_tri at driver size.

Times the G-suffix construction (sequential per-band loop vs pointer
doubling) and the in-band correction (lane gather vs sublane-transposed
gather) independently on the current backend, plus the shared extract /
pack / final-gather stages.

Usage: python benches/probe_transtri.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

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
    h = 256
    a = mask_padding(BitMatrix(
        jax.random.bits(jax.random.PRNGKey(0), (n, width_for(n)),
                        dtype=jnp.uint32), n))
    m, _, v, _ = ple(a)
    jax.block_until_ready(m.data)

    nrows, ncols = m.nrows, m.ncols
    nmin = min(ncols, v.shape[0])
    r_rows = min(nrows, nmin)
    Br = max(1, -(-r_rows // h))
    Bs = max(Br, -(-nmin // h))
    n_pad = Bs * h

    @jax.jit
    def setup(m, v):
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
        src = P._band_suffix_folds(w_slots)
        return sb, src[:, 0], src[:Br, 1:]

    sb, f_full, src_rows = bench("setup+folds     ", lambda: setup(m, v))

    c_all_h = jnp.arange(ncols, dtype=jnp.int32)

    @jax.jit
    def g_loop(sb, f_full):
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

    @jax.jit
    def g_double(sb, f_full):
        c_all = jnp.arange(ncols, dtype=jnp.int32)
        src_cols = jnp.take_along_axis(sb, f_full, axis=1)
        bidx_s = jnp.arange(Bs, dtype=jnp.int32)[:, None]
        F = jnp.broadcast_to(c_all[None, :], (Bs, ncols)).at[
            bidx_s, sb].set(src_cols, mode="drop")
        ST = F.T
        idcol = jnp.broadcast_to(c_all[:, None], (ncols, 1))
        w = 1
        while w < Bs:
            Sw = jnp.concatenate(
                [ST[:, w:], jnp.broadcast_to(idcol, (ncols, w))], axis=1)
            ST = jnp.take_along_axis(ST, Sw, axis=0)
            w *= 2
        return jnp.concatenate([ST, idcol], axis=1)[:, 1:Br + 1]

    g1 = bench("G sequential    ", lambda: g_loop(sb, f_full))
    g2 = bench("G doubling      ", lambda: g_double(sb, f_full))
    import numpy as np
    assert np.array_equal(np.asarray(g1), np.asarray(g2)), "G mismatch"

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
        return xt3, e_bits

    xt3, e_bits = bench("extract+unpack  ", lambda: extract(m, sb))

    @jax.jit
    def correct_lane(e_bits, src_rows):
        eb = e_bits.reshape(2 * h, Br, h).transpose(1, 2, 0)
        corrected = jnp.take_along_axis(eb, src_rows, axis=2)
        shifts = jnp.arange(WORD_BITS, dtype=jnp.uint32)
        cpk = corrected.transpose(0, 2, 1).reshape(
            Br, 2 * h, h // WORD_BITS, WORD_BITS).astype(jnp.uint32)
        return jnp.sum(cpk << shifts[None, None, None, :], axis=-1,
                       dtype=jnp.uint32)

    @jax.jit
    def correct_sublane(e_bits, src_rows):
        e_t = e_bits.reshape(2 * h, Br, h).transpose(1, 0, 2)
        idx_t = src_rows.transpose(0, 2, 1)
        corrected_t = jnp.take_along_axis(e_t, idx_t, axis=1)
        shifts = jnp.arange(WORD_BITS, dtype=jnp.uint32)
        cpk = corrected_t.reshape(
            Br, 2 * h, h // WORD_BITS, WORD_BITS).astype(jnp.uint32)
        return jnp.sum(cpk << shifts[None, None, None, :], axis=-1,
                       dtype=jnp.uint32)

    c1 = bench("correct lane    ", lambda: correct_lane(e_bits, src_rows))
    c2 = bench("correct sublane ", lambda: correct_sublane(e_bits, src_rows))
    assert np.array_equal(np.asarray(c1), np.asarray(c2)), "correct mismatch"

    @jax.jit
    def finish(xt3, cpk, sb, gidx):
        mid3 = xt3.at[sb[:Br], jnp.arange(Br, dtype=jnp.int32)[:, None],
                      :].set(cpk, mode="drop")
        return jnp.take_along_axis(mid3, gidx[:, :, None], axis=0)

    bench("scatter+Ggather ", lambda: finish(xt3, c1, sb, g1))


if __name__ == "__main__":
    main()
