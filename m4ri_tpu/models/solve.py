"""Linear system solving and kernel (nullspace) computation.

Reference analogue: solve.c — mzd_solve_left (PLUQ, then P-apply, TRSM
lower, consistency check, TRSM upper, Q^T-apply; solve.c:30-152) and
mzd_kernel_left_pluq (solve.c:154-191).

TPU-native shape discipline: the rank r is a traced scalar, so L and U are
embedded into *static* full-size unit-triangular matrices (identity beyond
rank) — the triangular solves then run on static shapes and masking recovers
the rank-dependent semantics (free variables are set to zero, and rows >= r
of the forward solve form the consistency residual).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.bitmatrix import BitMatrix, mask_padding, width_for
from ..core.permutation import apply_p_left, apply_p_left_trans, swaps_to_perm
from ..ops.mul import pack_bits, unpack_bits
from .echelon import echelonize_with_pivots
from .ple import block_factor
from .triangular import trsm_lower_left, trsm_upper_left

__all__ = ["solve_left", "kernel_left"]


@functools.partial(jax.jit, static_argnames=("nb",))
def solve_left(a: BitMatrix, b: BitMatrix, nb: int | None = None):
    """Solve A X = B (reference API: mzd_solve_left, solve.c:30).

    Returns (X, consistent): X is ncols(A) x ncols(B) with free variables
    zero; ``consistent`` is a traced bool — when False the system has no
    solution and X is meaningless (the reference returns -1)."""
    m, n = a.nrows, a.ncols
    assert b.nrows == m
    rmax = min(m, n)
    data, p, q, r = block_factor(a, preserve_l=True, nb=nb)
    bits = unpack_bits(data, jnp.uint8)[:, :n]  # (m, n)

    # L embedded in m x m unit lower triangular (identity beyond rank).
    pivcols = q[:rmax]
    lcols = bits[:, pivcols]  # (m, rmax): L[i,k] lives at column Q[k], i > k
    iidx = jnp.arange(m, dtype=jnp.int32)
    kidx = jnp.arange(rmax, dtype=jnp.int32)
    lmask = (iidx[:, None] > kidx[None, :]) & (kidx[None, :] < r)
    lbits = jnp.zeros((m, m), jnp.uint8)
    lbits = lbits.at[:, :rmax].set(lcols & lmask.astype(jnp.uint8))
    lbits = lbits | jnp.eye(m, dtype=jnp.uint8)
    lfull = BitMatrix(pack_bits(lbits), m)

    bp = apply_p_left(b, p)
    y = trsm_lower_left(lfull, bp)
    residual = y.data * (iidx >= r)[:, None].astype(jnp.uint32)
    consistent = jnp.all(residual == 0)

    # U embedded in n x n upper triangular: permute columns so pivots sit on
    # the diagonal (the L bits land strictly below it and are masked away).
    qperm = swaps_to_perm(q, ascending=True)
    ubits = jnp.zeros((n, n), jnp.uint8)
    topn = bits[:rmax, :][:, qperm]
    jcol = jnp.arange(n, dtype=jnp.int32)
    upper = (jcol[None, :] >= kidx[:, None]).astype(jnp.uint8)
    ubits = ubits.at[:rmax, :].set(topn * upper)
    ubits = ubits | (jnp.eye(n, dtype=jnp.uint8)
                     * (jcol >= r).astype(jnp.uint8)[None, :])
    ufull = BitMatrix(pack_bits(ubits), n)

    ydata = y.data[:rmax] * (kidx < r)[:, None].astype(jnp.uint32)
    ypad = jnp.zeros((n, width_for(b.ncols)), jnp.uint32)
    ypad = ypad.at[:rmax].set(ydata)
    xp = trsm_upper_left(ufull, BitMatrix(ypad, b.ncols))
    x = apply_p_left_trans(xp, q)
    return mask_padding(x), consistent


@functools.partial(jax.jit, static_argnames=("nb",))
def kernel_left(a: BitMatrix, nb: int | None = None):
    """Basis X of the right kernel {x : A x = 0} (reference API:
    mzd_kernel_left_pluq, solve.c:154).

    Returns (X, count): X is n x n whose first columns in *column index
    order* are nonzero exactly at the n-r free columns (pivot columns of X
    are zero); count = n - r.  A X == 0 always holds."""
    n = a.ncols
    rmax = min(a.nrows, n)
    rref, q, r = echelonize_with_pivots(a, nb=nb)
    bits = unpack_bits(rref.data, jnp.uint8)[:rmax, :n]  # (rmax, n)
    kidx = jnp.arange(rmax, dtype=jnp.int32)
    jcol = jnp.arange(n, dtype=jnp.int32)

    # valid pivot rows scatter to Q[k]; invalid ones to an OOB index (dropped)
    idx = jnp.where(kidx < r, q[:rmax], jnp.int32(n))
    ispivot = jnp.zeros((n,), jnp.bool_)
    ispivot = ispivot.at[idx].set(True, mode="drop")

    xbits = jnp.zeros((n, n), jnp.uint8)
    # X[Q[k], j] = R[k, j] for k < r
    rows = bits * (kidx < r)[:, None].astype(jnp.uint8)
    xbits = xbits.at[idx, :].set(rows, mode="drop")
    # diagonal 1 on free columns
    xbits = xbits | (jnp.eye(n, dtype=jnp.uint8)
                     * (~ispivot).astype(jnp.uint8)[None, :])
    # zero out pivot columns entirely
    xbits = xbits * (~ispivot).astype(jnp.uint8)[None, :]
    count = n - r
    return mask_padding(BitMatrix(pack_bits(xbits), n)), count


@functools.partial(jax.jit, static_argnames=())
def pluq_solve_left(m: BitMatrix, p, q, r, b: BitMatrix):
    """Solve A X = B given an existing PLUQ factorization of A (reference
    API: mzd_pluq_solve_left, solve.c:55-120): M holds L strictly below the
    diagonal and U on/above it, with P/Q the swap arrays and r the rank."""
    import jax.numpy as jnp
    mm, n = m.nrows, m.ncols
    rmax = min(mm, n)
    bits = unpack_bits(m.data, jnp.uint8)[:, :n]
    iidx = jnp.arange(mm, dtype=jnp.int32)
    kidx = jnp.arange(rmax, dtype=jnp.int32)
    jcol = jnp.arange(n, dtype=jnp.int32)

    lmask = (iidx[:, None] > kidx[None, :]) & (kidx[None, :] < r)
    lbits = jnp.zeros((mm, mm), jnp.uint8)
    lbits = lbits.at[:, :rmax].set(bits[:, :rmax] & lmask.astype(jnp.uint8))
    lbits = lbits | jnp.eye(mm, dtype=jnp.uint8)
    lfull = BitMatrix(pack_bits(lbits), mm)

    bp = apply_p_left(b, p)
    y = trsm_lower_left(lfull, bp)
    consistent = jnp.all(y.data * (iidx >= r)[:, None].astype(jnp.uint32) == 0)

    ubits = jnp.zeros((n, n), jnp.uint8)
    upper = (jcol[None, :] >= kidx[:, None]).astype(jnp.uint8)
    ubits = ubits.at[:rmax, :].set(bits[:rmax] * upper)
    ubits = ubits | (jnp.eye(n, dtype=jnp.uint8)
                     * (jcol >= r).astype(jnp.uint8)[None, :])
    ufull = BitMatrix(pack_bits(ubits), n)

    ydata = y.data[:rmax] * (kidx < r)[:, None].astype(jnp.uint32)
    ypad = jnp.zeros((n, width_for(b.ncols)), jnp.uint32)
    ypad = ypad.at[:rmax].set(ydata)
    xp = trsm_upper_left(ufull, BitMatrix(ypad, b.ncols))
    x = apply_p_left_trans(xp, q)
    return mask_padding(x), consistent
