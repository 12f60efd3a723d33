"""Pallas kernel for the panel factorization's sequential pivot loop.

The XLA lowering of the per-column pivot hunt (models/ple.py make_colstep)
costs ~6.5 us per column on v5e through the dev runtime — 2.2 us of which
is the bare fori_loop iteration floor — i.e. ~0.1 s of pure loop overhead
for an n=16384 factorization.  Running the *whole* nb-column loop as one
VMEM-resident Mosaic kernel removes the per-op overhead entirely: the
window (<= 512 x 2*nbw packed words, 16 KB) lives in VMEM/registers and
each column step is a handful of vector ops.

Reference analogue: ple_russian.c:119-188 confines the serial pivot work
to a cache-resident window for exactly the same reason.

Mosaic workarounds (see also pallas_mul.py): no variable-lane indexing
(column words are extracted with a lane-mask reduction), no scalar-constant
left shifts >= 17 (the per-column elimination masks and the L-slot bit are
precomputed host-side tables indexed by sublane), 2-D iotas only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import WORD_BITS

__all__ = ["panel_loop"]


@functools.lru_cache(maxsize=32)
def _tables(nb: int, preserve_l: bool):
    """Host-precomputed per-column elimination masks.

    wmask[j] masks the pivot row to the panel columns that elimination may
    touch (> j when preserve_l, all panel columns otherwise); lbit[s] is
    the multiplier bit for pivot slot s in the L half of the fused row."""
    nbw = nb // WORD_BITS
    wmask = np.zeros((nb, 2 * nbw), np.uint32)
    lbit = np.zeros((nb, 2 * nbw), np.uint32)
    for j in range(nb):
        w, s = divmod(j, WORD_BITS)
        if preserve_l:
            wmask[j, w] = (0xFFFFFFFF << (s + 1)) & 0xFFFFFFFF if s < 31 else 0
            wmask[j, w + 1 : nbw] = 0xFFFFFFFF
        else:
            wmask[j, :nbw] = 0xFFFFFFFF
        lbit[j, nbw + w] = np.uint32(1) << s
    return wmask, lbit


def _make_kernel(h: int, nb: int, search_window: int):
    def kernel(s_ref, al_in, wmask_ref, lbit_ref,
               al_ref, rp_ref, tch_ref, pp_ref, qq_ref, r_ref, cw_ref):
        w2 = al_in.shape[1]
        r0 = s_ref[0]
        base = s_ref[1]
        m = s_ref[2]
        al_ref[:] = al_in[:]
        rowiota = lax.broadcasted_iota(jnp.int32, (h, 1), 0)
        laneiota = lax.broadcasted_iota(jnp.int32, (1, w2), 1)
        rp_ref[:] = rowiota
        tch_ref[:] = jnp.zeros((2 * nb, 1), jnp.int32)
        pp_ref[:] = jnp.zeros((nb, 1), jnp.int32)
        qq_ref[:] = jnp.zeros((nb, 1), jnp.int32)
        pos_ok = (base + rowiota) < m                     # (h, 1), loop-inv
        nbw = w2 // 2

        def one(x):
            return jnp.broadcast_to(x, (1, 1)).astype(jnp.int32)

        def body(j, r):
            wloc = j // WORD_BITS
            sh = (j - wloc * WORD_BITS).astype(jnp.uint32)

            # cw caches the CURRENT panel word for every row, pre-shifted
            # so the current column is always bit 0 (col = cw & 1): the
            # nbw-way lane-select chain runs once per 32 columns instead
            # of every column, the rest of the maintenance is one scalar
            # broadcast per step (swap rows / XOR the eliminated word /
            # shift right) — measured ~2x on the per-column cost.
            @pl.when(sh == 0)
            def _():
                colw = al_ref[:, 0:1]
                for i in range(1, nbw):
                    colw = jnp.where(wloc == i, al_ref[:, i : i + 1], colw)
                cw_ref[:] = colw

            col = (cw_ref[:] & 1).astype(jnp.int32)       # (h, 1)
            rs = r - base
            cand = (col == 1) & (rowiota >= rs) & pos_ok
            if search_window:
                cand = cand & (rowiota < rs + search_window)
            first = jnp.min(jnp.where(cand, rowiota, jnp.int32(h)))
            found = first < h
            ps = jnp.where(found, first, rs)

            # pre-swap column bit of the row leaving position rs (cheap
            # dynamic sublane read, not a full-height reduce)
            col_rs = (cw_ref[pl.ds(rs, 1), :] & 1).astype(jnp.int32)[0, 0]

            row_rs = al_ref[pl.ds(rs, 1), :]
            row_ps = al_ref[pl.ds(ps, 1), :]
            al_ref[pl.ds(rs, 1), :] = row_ps
            al_ref[pl.ds(ps, 1), :] = row_rs
            cw_rs = cw_ref[pl.ds(rs, 1), :]
            cw_ps = cw_ref[pl.ds(ps, 1), :]
            cw_ref[pl.ds(rs, 1), :] = cw_ps
            cw_ref[pl.ds(ps, 1), :] = cw_rs
            pr = rp_ref[pl.ds(rs, 1), :]
            pp = rp_ref[pl.ds(ps, 1), :]
            rp_ref[pl.ds(rs, 1), :] = pp
            rp_ref[pl.ds(ps, 1), :] = pr

            slot = r - r0
            tch_ref[pl.ds(2 * j, 1), :] = one(rs)
            tch_ref[pl.ds(2 * j + 1, 1), :] = one(ps)
            pp_ref[pl.ds(slot, 1), :] = one(ps)
            qq_ref[pl.ds(slot, 1), :] = one(j)

            wmask = wmask_ref[pl.ds(j, 1), :]
            lbit = lbit_ref[pl.ds(slot, 1), :]
            elim_row = (row_ps & wmask) | lbit            # (1, w2)
            # the masked elimination word at lane wloc, in cw's shifted
            # domain (bit 0 = current column, dropped by the >> 1 below).
            # One-hot select + sum; Mosaic rejects reductions over
            # unsigned vectors, so reduce on the int32 bit pattern.
            ew_i = jnp.sum(jnp.where(
                laneiota == wloc,
                lax.bitcast_convert_type(elim_row, jnp.int32), 0))
            # int32 -> uint32 conversion wraps mod 2^32 = same bit pattern
            # (Mosaic has no scalar bitcast)
            ew = ew_i.astype(jnp.uint32) >> sh
            # post-swap column bits: position ps received old row rs
            col2 = jnp.where(rowiota == ps, col_rs, col)
            elim = (col2 == 1) & (rowiota > rs) & found
            em = elim.astype(jnp.uint32)                  # (h, 1)
            al_ref[:] = al_ref[:] ^ (em * elim_row)
            cw_ref[:] = (cw_ref[:] ^ (em * ew)) >> 1
            return r + found.astype(jnp.int32)

        r = lax.fori_loop(0, nb, body, r0)
        r_ref[:] = jnp.broadcast_to(r, (1, 1))

    return kernel


@functools.partial(jax.jit, static_argnames=("nb", "preserve_l",
                                             "search_window", "interpret"))
def panel_loop(al0, r0, base, m, nb: int, preserve_l: bool,
               search_window: int = 0, interpret: bool = False):
    """Run the canonical nb-column pivot loop on a fused [panel | L] window.

    al0: uint32 (h, 2*nbw); r0/base/m: traced int32 scalars (current rank,
    global position of window row 0, valid row count).  Returns
    (AL, rowperm (h,), r, touched (2nb,), p_pan (nb,), q_pan (nb,)) with
    the *local* conventions of models/ple.py make_colstep (p_pan/q_pan are
    window-local; the caller adds base / panel-column offsets)."""
    h, w2 = al0.shape
    assert w2 == 2 * (nb // WORD_BITS)
    wmask, lbit = _tables(nb, preserve_l)
    scalars = jnp.stack([jnp.int32(r0), jnp.int32(base), jnp.int32(m)])
    out = pl.pallas_call(
        _make_kernel(h, nb, search_window),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_shape=[
            jax.ShapeDtypeStruct((h, w2), jnp.uint32),
            jax.ShapeDtypeStruct((h, 1), jnp.int32),
            jax.ShapeDtypeStruct((2 * nb, 1), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((h, 1), jnp.uint32)],  # cw cache
        compiler_params=pltpu.CompilerParams(
            # the (h, 1) buffers are 128-lane padded; the full-height
            # fallback window at h = 8192 plus the cw scratch exceeds the
            # 16 MB default scoped-VMEM cap
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(scalars, al0, wmask, lbit)
    al, rp, tch, pp, qq, r = out
    return (al, rp[:, 0], r[0, 0], tch[:, 0], pp[:, 0], qq[:, 0])
