"""Fused below-window panel elimination ("panel post") kernel.

After the window pivot loop, the panel factorization (models/ple.py) must
eliminate every row below the window against the panel's pivots:

    lam = X @ (E^T T)          multipliers  (T = U_piv^{-1})
    v   = X ^ lam @ wmat       eliminated panel values
    miss = any(v & colmask)    exact window-miss detection

On the XLA path this chain unpacks the full m x nb panel to int8, runs two
MXU products, re-packs two results and reduces the miss flag — each step
materializing (and, inside the factorization scan, layout-copying) an
m x nb intermediate in HBM.  This kernel fuses the whole chain into one
row-tiled pass: packed words stream in, everything unpacked lives in VMEM
only, and packed lam / v words plus a single miss scalar stream out.
Traffic drops from ~6 m*nb-sized arrays to read-1 + write-2 packed panels.

Operands are pre-permuted to the plane layout of ops/pallas_mul (bit s of
word w at lane s*nbw + w) so the in-kernel unpack is a shift/concat, not a
gather; the small nb x nb matrices are permuted outside accordingly.

Reference analogue: the lazy below-submatrix updates of the MMPF basecase
(_mzd_ple_submatrix's done[] discipline plus _mzd_process_rows_ple_N,
ple_russian.c:119-188, ple_russian_template.h:3-113) — same role, recast
as a single fused MXU/VPU pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import WORD_BITS
from .pallas_mul import _pack_planes, _unpack_planes_ax1

__all__ = ["panel_post", "plane_perm"]


@functools.lru_cache(maxsize=8)
def plane_perm(nbw: int) -> np.ndarray:
    """c_of_l: original column index at plane lane l (inverse of the
    _unpack_planes_ax1 layout l = (c % 32) * nbw + c // 32)."""
    l = np.arange(nbw * WORD_BITS)
    return (l % nbw) * WORD_BITS + l // nbw


def _make_kernel(tm: int, nbw: int):
    nb = nbw * WORD_BITS

    def _kernel(scal, xw_ref, mp_ref, wp_ref, cm_ref, vw_ref, lam_ref,
                miss_ref):
        i = pl.program_id(0)
        below0 = scal[0]
        mvalid = scal[1]

        @pl.when(i == 0)
        def _():
            miss_ref[:] = jnp.zeros((1, 1), jnp.int32)

        xw = xw_ref[:]                                  # (tm, nbw) uint32
        # default: passthrough (also covers tiles fully outside the
        # below-window range, which would otherwise burn two MXU products
        # per tile just to discard them — cf. the pallas_schur guards)
        vw_ref[:] = xw
        lam_ref[:] = jnp.zeros_like(xw)

        @pl.when((i * tm + tm > below0) & (i * tm < mvalid))
        def _():
            xu = _unpack_planes_ax1(xw)                 # (tm, nb) int8
            gpos = i * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
            below = (gpos >= below0) & (gpos < mvalid)  # (tm, 1)

            lam32 = (jax.lax.dot_general(
                xu, mp_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32) & 1)  # (tm, nb)
            lam32 = lam32 * below.astype(jnp.int32)
            v32 = xu.astype(jnp.int32) ^ (jax.lax.dot_general(
                lam32.astype(jnp.int8), wp_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32) & 1)  # (tm, nb)

            vw_ref[:] = jnp.where(below, _pack_planes(v32, nbw), xw)
            lam_ref[:] = _pack_planes(lam32, nbw)
            hit = jnp.max(v32 * cm_ref[0:1, :].astype(jnp.int32)
                          * below.astype(jnp.int32))
            miss_ref[:] = jnp.maximum(miss_ref[:], hit)

    return _kernel


@functools.partial(jax.jit, static_argnames=("tm", "interpret"))
def _post_padded(scal, xw, mp, wp, cm, tm: int, interpret: bool = False):
    m, nbw = xw.shape
    nb = nbw * WORD_BITS
    return pl.pallas_call(
        _make_kernel(tm, nbw),
        grid=(m // tm,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tm, nbw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, nb), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, nb), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, nb), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, nbw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, nbw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, nbw), jnp.uint32),
            jax.ShapeDtypeStruct((m, nbw), jnp.uint32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the narrow (tm, nbw) blocks are 128-lane padded in VMEM and
            # Mosaic double-buffers them across grid steps: at tm=1024 the
            # stack tops the 16 MB default scoped-VMEM cap (measured
            # 17.34M on a 1024x128 panel) — raise it like the other
            # kernels (v5e has 128 MB)
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * m * nb * nb,          # two nb-deep MXU products
            bytes_accessed=3 * m * nbw * 4 + 2 * nb * nb,
            transcendentals=0),
        interpret=interpret,
    )(scal, xw, mp, wp, cm)


def _pick_tm(m: int, pref: int = 1024) -> int:
    """Largest 256-multiple divisor of m up to pref: the kernel is
    grid-step-latency-bound (~2 us/tile of DMA issue against ~0.3 us of
    MXU work), so fewer, taller tiles win as long as the int32
    intermediates stay comfortably inside VMEM."""
    best = 256
    t = 256
    while t <= pref:
        if m % t == 0:
            best = t
        t += 256
    return best


def panel_post(xw: jnp.ndarray, m_small: jnp.ndarray, wmat: jnp.ndarray,
               colmask_bits: jnp.ndarray, below0, mvalid,
               tm: int | None = None, interpret: bool = False):
    """Fused below-window elimination.

    xw: uint32[m, nbw] packed stale panel words (m % tm == 0);
    m_small = (E^T T) and wmat: int8[nb, nb]; colmask_bits: 0/1 int8[nb]
    (1 at declared-non-pivot valid columns — all zero disables the miss
    check); below0/mvalid: traced row bounds.  Returns (vw, lamw, miss):
    packed eliminated values (rows in [below0, mvalid); others pass
    through), packed multipliers (zero outside the range), and a traced
    bool that some below-window row still has a 1 in a non-pivot column.
    """
    m, nbw = xw.shape
    nb = nbw * WORD_BITS
    assert m_small.shape == (nb, nb) and wmat.shape == (nb, nb)
    if tm is None:
        tm = _pick_tm(m)
    assert m % tm == 0, (m, tm)
    perm = plane_perm(nbw)
    mp = m_small[perm][:, perm]
    wp = wmat[perm][:, perm]
    cm = jnp.broadcast_to(colmask_bits[perm][None, :].astype(jnp.int8),
                          (8, nb))
    scal = jnp.stack([jnp.asarray(below0, jnp.int32),
                      jnp.asarray(mvalid, jnp.int32)])
    vw, lamw, miss = _post_padded(scal, xw, mp, wp, cm, tm, interpret)
    return vw, lamw, miss[0, 0] > 0
