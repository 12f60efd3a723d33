"""Fused Pallas Schur-update kernel: C ^= L @ U with tile skipping.

The panel factorization (models/ple.py) spends most of its time in the
per-panel Schur update A ^= Lp @ Up.  Routing that through the general
matmul kernel (ops/pallas_mul.py) plus an XLA XOR pass wastes work three
ways, all fixed here:

1. *Rows above the current rank*: Lp rows < r0 are structurally zero
   (nothing above the already-factored block carries multipliers,
   reference analogue: the recursion only updates the trailing quadrant,
   ple.c:122-127), so their product tiles are zero.  Tiles whose row range
   lies entirely above r0 skip the MXU work and pass C through unchanged.
2. *Columns left of the trailing edge*: Up is masked to columns >= the
   next panel (word c0w), so tiles entirely left of c0w likewise pass
   through.  Averaged over the sweep this removes ~3/4 of the tile work —
   the packed analogue of recursing on the trailing submatrix, which a
   uniform ``lax.scan`` cannot express with shrinking shapes.
3. *The XOR is fused*: no full-size delta materialization in HBM and no
   separate read-modify-write pass.

The bounds (r0, c0w) arrive as SMEM scalars, so one compiled kernel
serves every panel of the scan.  Operand layout matches pallas_mul: L is
word-transposed and i-tiled, U is plane-row-permuted and j-tiled, both
fetched with manual contiguous DMA; C streams through automatic
(tm, tnw) blocks which Mosaic pipelines across grid steps.  The unpacked
U tile is cached in scratch across the i-sweep of each j column (grid is
(J, I), i fastest, "arbitrary" semantics so the visit order is fixed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import WORD_BITS
from .pallas_mul import (_pack_planes, _plane_dot, _resolve_op_dtype,
                         _unpack_planes_ax1)

__all__ = ["gf2_schur_update", "gf2_schur_update_dyn"]


def _make_kernel(tm: int, tkw: int, tnw: int, j0: int = 0, dt=jnp.int8):
    tk = tkw * WORD_BITS

    def _kernel(bounds, c_in, at_hbm, bp_hbm, o_ref, ub_ref, abuf, bbuf,
                sems):
        j = pl.program_id(0) + j0
        i = pl.program_id(1)
        r0 = bounds[0]
        c0w = bounds[1]
        col_active = (j + 1) * tnw > c0w
        row_active = (i + 1) * tm > r0

        # refresh the unpacked-U cache once per j column
        @pl.when(col_active & (i == 0))
        def _():
            cp = pltpu.make_async_copy(bp_hbm.at[j], bbuf, sems.at[0])
            cp.start()
            cp.wait()
            ub_ref[:] = _unpack_planes_ax1(bbuf[:], dt)

        # default: pass the C tile through unchanged
        o_ref[:] = c_in[:]

        @pl.when(col_active & row_active)
        def _():
            cp = pltpu.make_async_copy(at_hbm.at[i], abuf, sems.at[1])
            cp.start()
            cp.wait()
            acc = _plane_dot(abuf[:], ub_ref[:], dt)
            o_ref[:] = c_in[:] ^ _pack_planes(acc & 1, tnw)

    return _kernel


@functools.partial(jax.jit,
                   static_argnames=("tm", "tkw", "tnw", "j0", "interpret",
                                    "op_dtype"))
def _schur_padded(bounds, c, at3, bp3, tm: int, tkw: int, tnw: int,
                  j0: int = 0, interpret: bool = False,
                  op_dtype: str = "int8"):
    m, nw = c.shape
    tk = tkw * WORD_BITS
    tn = tnw * WORD_BITS
    # j0 = column tiles statically known to be left of the trailing edge
    # (c0w >= j0*tnw): the grid never visits them and, with the in-place
    # aliasing, their data stays put without being streamed at all.
    grid = (nw // tnw - j0, m // tm)  # j outer, i fastest (U-cache/column)
    return pl.pallas_call(
        _make_kernel(tm, tkw, tnw, j0, getattr(jnp, op_dtype)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tm, tnw), lambda j, i: (i, j + j0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tm, tnw), lambda j, i: (i, j + j0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, nw), jnp.uint32),
        # C updates in place: every (i, j) tile is visited exactly once and
        # read before the write, so aliasing is safe — and it removes a
        # full-size output allocation + copy per panel inside the scan.
        input_output_aliases={1: 0},
        scratch_shapes=[
            pltpu.VMEM((tk, tn), getattr(jnp, op_dtype)),  # unpacked-U cache
            pltpu.VMEM((tkw, tm), jnp.uint32),   # L chunk
            pltpu.VMEM((tk, tnw), jnp.uint32),   # packed-U chunk
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * tk * (nw * WORD_BITS),
            bytes_accessed=(tkw * m + tk * nw + 2 * m * nw) * 4,
            transcendentals=0),
        interpret=interpret,
    )(bounds, c, at3, bp3)


def _make_dyn_kernel(tm: int, tkw: int, tnw: int, I: int, J: int,
                     dt=jnp.int8):
    """Single-instance fully-dynamic tile skipping: instead of a static
    j0 per compiled instance (lax.switch in models/ple.py) the kernel
    runs ONE hand-rolled software pipeline whose trip count derives from
    the runtime (r0, c0w) — tiles above the rank or left of the trailing
    edge are never streamed at all, in BOTH dimensions.  This is the
    packed analogue of the reference recursing on the shrinking trailing
    quadrant (ple.c:122-127) with no instance explosion and no
    static-bound slack.  (pltpu.emit_pipeline would express this, but it
    cannot run under the CPU interpreter, which would leave the
    production path without test coverage — so the double-buffered DMA
    pipeline is written out with the same primitives pallas_panel uses.)
    """
    tk = tkw * WORD_BITS

    def _kernel(bounds, c_hbm, at_hbm, bp_hbm, o_hbm, cbuf, abuf, ubuf,
                ub_ref, ci_sem, ai_sem, ui_sem, co_sem):
        r0 = bounds[0]
        c0w = bounds[1]
        i_start = r0 // tm          # tiles fully above r0 are inactive
        j_start = c0w // tnw        # tiles fully left of c0w likewise
        n_i = I - i_start
        n_j = J - j_start
        total = jnp.where((n_i > 0) & (n_j > 0), n_j * n_i, 0)

        def tile_of(s):
            jr = s // n_i
            ir = s - jr * n_i
            return i_start + ir, j_start + jr, ir, jr

        def c_tile(hbm, i, j):
            return hbm.at[pl.ds(i * tm, tm), pl.ds(j * tnw, tnw)]

        def start_inputs(s, slot):
            i, j, _, _ = tile_of(s)
            pltpu.make_async_copy(c_tile(c_hbm, i, j), cbuf.at[slot],
                                  ci_sem.at[slot]).start()
            pltpu.make_async_copy(at_hbm.at[i], abuf.at[slot],
                                  ai_sem.at[slot]).start()

        @pl.when(total > 0)
        def _prologue():
            start_inputs(0, 0)
            _, j0_, _, _ = tile_of(0)
            pltpu.make_async_copy(bp_hbm.at[j0_], ubuf.at[0],
                                  ui_sem.at[0]).start()

        def body(s, carry):
            slot = s % 2
            i, j, ir, jr = tile_of(s)
            colp = jr % 2

            # new column: wait its U, cache it unpacked, prefetch next
            @pl.when(ir == 0)
            def _():
                pltpu.make_async_copy(bp_hbm.at[j], ubuf.at[colp],
                                      ui_sem.at[colp]).wait()
                ub_ref[:] = _unpack_planes_ax1(ubuf[colp], dt)

                @pl.when(jr + 1 < n_j)
                def _():
                    pltpu.make_async_copy(
                        bp_hbm.at[j + 1], ubuf.at[1 - colp],
                        ui_sem.at[1 - colp]).start()

            pltpu.make_async_copy(c_tile(c_hbm, i, j), cbuf.at[slot],
                                  ci_sem.at[slot]).wait()
            pltpu.make_async_copy(at_hbm.at[i], abuf.at[slot],
                                  ai_sem.at[slot]).wait()

            acc = _plane_dot(abuf[slot], ub_ref[:], dt)

            # This slot's previous write-back (step s-2) already landed:
            # the prefetch branch of step s-1 drained co_sem[slot] BEFORE
            # starting the input DMA that refilled cbuf[slot] — waiting it
            # again here would decrement the semaphore twice per signal
            # and deadlock the pipeline (observed as a TPU kernel fault).

            cbuf[slot] = cbuf[slot] ^ _pack_planes(acc & 1, tnw)
            pltpu.make_async_copy(cbuf.at[slot], c_tile(o_hbm, i, j),
                                  co_sem.at[slot]).start()

            # prefetch step s+1 into the other slot; its outstanding
            # write-back (started at step s-1) must land before the
            # incoming DMA reuses the buffer
            @pl.when(s + 1 < total)
            def _():
                @pl.when(s >= 1)
                def _():
                    i3, j3, _, _ = tile_of(s - 1)
                    pltpu.make_async_copy(
                        cbuf.at[1 - slot], c_tile(o_hbm, i3, j3),
                        co_sem.at[1 - slot]).wait()

                start_inputs(s + 1, 1 - slot)

            return carry

        jax.lax.fori_loop(0, total, body, 0, unroll=False)

        # drain the last two write-backs
        @pl.when(total >= 1)
        def _():
            s = total - 1
            i, j, _, _ = tile_of(s)
            pltpu.make_async_copy(cbuf.at[s % 2], c_tile(o_hbm, i, j),
                                  co_sem.at[s % 2]).wait()

        @pl.when(total >= 2)
        def _():
            s = total - 2
            i, j, _, _ = tile_of(s)
            pltpu.make_async_copy(cbuf.at[s % 2], c_tile(o_hbm, i, j),
                                  co_sem.at[s % 2]).wait()

    return _kernel


@functools.partial(jax.jit,
                   static_argnames=("tm", "tkw", "tnw", "interpret",
                                    "op_dtype"))
def _schur_dyn_padded(bounds, c, at3, bp3, tm: int, tkw: int, tnw: int,
                      interpret: bool = False, op_dtype: str = "int8"):
    m, nw = c.shape
    tk = tkw * WORD_BITS
    tn = tnw * WORD_BITS
    I, J = m // tm, nw // tnw
    return pl.pallas_call(
        _make_dyn_kernel(tm, tkw, tnw, I, J, getattr(jnp, op_dtype)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((m, nw), jnp.uint32),
        # in place: untouched (skipped) tiles keep their input bytes
        input_output_aliases={1: 0},
        scratch_shapes=[
            pltpu.VMEM((2, tm, tnw), jnp.uint32),   # C tile double buffer
            pltpu.VMEM((2, tkw, tm), jnp.uint32),   # L chunk double buffer
            pltpu.VMEM((2, tk, tnw), jnp.uint32),   # packed-U double buffer
            pltpu.VMEM((tk, tn), getattr(jnp, op_dtype)),  # unpacked-U cache
            pltpu.SemaphoreType.DMA((2,)),          # C in
            pltpu.SemaphoreType.DMA((2,)),          # L in
            pltpu.SemaphoreType.DMA((2,)),          # U in
            pltpu.SemaphoreType.DMA((2,)),          # C out
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * tk * (nw * WORD_BITS),
            bytes_accessed=(tkw * m + tk * nw + 2 * m * nw) * 4,
            transcendentals=0),
        interpret=interpret,
    )(bounds, c, at3, bp3)


def gf2_schur_update_dyn(c_data: jnp.ndarray, lp_data: jnp.ndarray,
                         up_data: jnp.ndarray, r0, c0w,
                         tm: int = 256, tnw: int = 128,
                         interpret: bool = False,
                         op_dtype: str = "int8") -> jnp.ndarray:
    """Fully-dynamic variant of gf2_schur_update: same contract (lp rows
    above r0 zero, up columns left of word c0w zero), but the inactive
    tiles are skipped from one compiled kernel via a dynamically-bounded
    software pipeline instead of per-instance static bounds.  Requires
    shapes pre-aligned to the tiles (production panel shapes are)."""
    m, nw = c_data.shape
    m2, kw = lp_data.shape
    k, nw2 = up_data.shape
    assert m2 == m and nw2 == nw and k <= kw * WORD_BITS
    assert m % tm == 0 and nw % tnw == 0 and kw % 8 == 0, \
        (m, tm, nw, tnw, kw)
    tkw = kw
    k_pad = kw * WORD_BITS
    at3 = lp_data.T.reshape(kw, m // tm, tm).swapaxes(0, 1)  # (I, kw, tm)
    up = up_data
    if k < k_pad:
        up = jnp.pad(up, ((0, k_pad - k), (0, 0)))
    bp = (up.reshape(1, tkw, WORD_BITS, nw).swapaxes(1, 2)
            .reshape(k_pad, nw))
    bp3 = bp.reshape(k_pad, nw // tnw, tnw).swapaxes(0, 1)  # (J, tk, tnw)
    bounds = jnp.stack([jnp.asarray(r0, jnp.int32),
                        jnp.asarray(c0w, jnp.int32)])
    return _schur_dyn_padded(bounds, c_data, at3, bp3, tm, tkw, tnw,
                             interpret, _resolve_op_dtype(op_dtype,
                                                          interpret))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _tile_div(total: int, pref: int) -> int:
    """Largest divisor of ``total`` that is <= pref (tiles must divide the
    padded dimension exactly; a tile equal to the array dim is always
    legal for the lane axis)."""
    t = min(pref, total)
    while total % t:
        t -= 1
    return t


def gf2_schur_update(c_data: jnp.ndarray, lp_data: jnp.ndarray,
                     up_data: jnp.ndarray, r0, c0w,
                     tm: int | None = None, tnw: int | None = None,
                     col_tile_skip: int = 0,
                     interpret: bool = False,
                     op_dtype: str = "int8") -> jnp.ndarray:
    """Packed GF(2) fused update ``C ^ Lp @ Up`` with dynamic tile bounds.

    c: uint32[m, nw];  lp: uint32[m, kw];  up: uint32[k, nw], k <= kw*32.
    Exactness contract (guaranteed by the panel factorization): rows of lp
    above ``r0`` are zero, and columns of up left of packed word ``c0w``
    are zero — tiles entirely inside those regions are passed through
    without computing, which is exact because their delta is zero.

    ``col_tile_skip``: number of leading column tiles the caller statically
    guarantees lie left of the trailing edge (col_tile_skip * tnw <= c0w
    for every runtime c0w).  Those tiles are never even streamed — with
    the in-place output aliasing their bytes are untouched — which is
    what makes the panel sweep's C traffic shrink as the sweep advances
    (the packed analogue of the reference recursing on the trailing
    quadrant, ple.c:122-127).  Requires tiles to be known: only applied
    when the caller also fixes tm/tnw.
    """
    m, nw = c_data.shape
    m2, kw = lp_data.shape
    k, nw2 = up_data.shape
    assert m2 == m and nw2 == nw and k <= kw * WORD_BITS, \
        (c_data.shape, lp_data.shape, up_data.shape)
    m_in, nw_in = m, nw
    if not interpret:
        # Mosaic DMA destinations need 128-lane alignment: pad the row dim
        # (lane axis of the transposed L tiles) to a 256 multiple and the
        # word dim to a 128 multiple.  Zero L rows / U columns are
        # passed through, so padding is exact; production shapes from the
        # panel factorization are already aligned and skip the copies.
        if m % 256:
            pad = _round_up(m, 256) - m
            c_data = jnp.pad(c_data, ((0, pad), (0, 0)))
            lp_data = jnp.pad(lp_data, ((0, pad), (0, 0)))
            m += pad
        if nw % 128:
            pad = _round_up(nw, 128) - nw
            c_data = jnp.pad(c_data, ((0, 0), (0, pad)))
            up_data = jnp.pad(up_data, ((0, 0), (0, pad)))
            nw += pad
        # The L chunk is DMA'd as a (kw, tm) sublane slice, so kw must be
        # 8-sublane aligned (Mosaic rejects e.g. the kw=5 of a 150-column
        # panel).  Extra L words are zero and meet zero-padded U rows.
        if kw % 8:
            lp_data = jnp.pad(lp_data, ((0, 0), (0, _round_up(kw, 8) - kw)))
            kw = lp_data.shape[1]
    if tm is None:
        tm = _tile_div(m, 256)
    if tnw is None:
        tnw = _tile_div(nw, 128)
    assert m % tm == 0 and nw % tnw == 0, (m, tm, nw, tnw)
    tkw = kw
    k_pad = kw * WORD_BITS

    at3 = lp_data.T.reshape(kw, m // tm, tm).swapaxes(0, 1)  # (I, kw, tm)
    up = up_data
    if k < k_pad:
        up = jnp.pad(up, ((0, k_pad - k), (0, 0)))
    # plane-permute rows to match the unpacked contraction lanes
    # (reshape+transpose, not a gather — see pallas_mul.py)
    bp = (up.reshape(1, tkw, WORD_BITS, nw).swapaxes(1, 2)
            .reshape(k_pad, nw))
    bp3 = bp.reshape(k_pad, nw // tnw, tnw).swapaxes(0, 1)  # (J, tk, tnw)
    bounds = jnp.stack([jnp.asarray(r0, jnp.int32),
                        jnp.asarray(c0w, jnp.int32)])
    assert 0 <= col_tile_skip < nw // tnw or col_tile_skip == 0, \
        (col_tile_skip, nw, tnw)
    out = _schur_padded(bounds, c_data, at3, bp3, tm, tkw, tnw,
                        col_tile_skip, interpret,
                        _resolve_op_dtype(op_dtype, interpret))
    if (m_in, nw_in) != (m, nw):
        out = out[:m_in, :nw_in]
    return out
