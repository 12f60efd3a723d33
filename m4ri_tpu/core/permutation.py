"""LAPACK-style permutations (reference: mzp_t, mzp.h:37-49, mzp.c).

A permutation is stored as a swap array ``v`` with ``v[i] >= i``; applying it
"left" (to rows) means performing ``swap(i, v[i])`` for i ascending
(mzd_apply_p_left, mzp.c:65-72); the transpose applies the swaps descending
(mzp.c:74-81).  We keep this exact format so P/Q outputs are interchangeable
with the reference's.

TPU-first design: instead of materializing each swap as a row copy, the swap
sequence is folded into a single permutation vector (a sequential fori_loop
over *scalars*), and the matrix is permuted with one gather.  Column
applications gather bit-columns through unpack/pack.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.config import WORD_BITS
from .bitmatrix import BitMatrix, mask_padding
from ..ops.mul import pack_bits, unpack_bits

__all__ = [
    "swaps_to_perm", "invert_perm", "apply_p_left", "apply_p_left_trans",
    "apply_p_right", "apply_p_right_trans", "apply_p_right_trans_tri",
    "permute_rows", "permute_cols",
]


def swaps_to_perm(v: jnp.ndarray, ascending: bool = True) -> jnp.ndarray:
    """Fold the swap sequence into a permutation ``perm`` such that
    ``new[i] = old[perm[i]]``."""
    n = v.shape[0]

    def body(k, perm):
        i = k if ascending else n - 1 - k
        j = v[i]
        pi, pj = perm[i], perm[j]
        return perm.at[i].set(pj).at[j].set(pi)

    return jax.lax.fori_loop(0, n, body, jnp.arange(n, dtype=jnp.int32))


def invert_perm(perm: jnp.ndarray) -> jnp.ndarray:
    n = perm.shape[0]
    return jnp.zeros((n,), jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))


def permute_rows(m: BitMatrix, perm: jnp.ndarray) -> BitMatrix:
    return BitMatrix(m.data[perm, :], m.ncols)


def permute_cols(m: BitMatrix, perm: jnp.ndarray) -> BitMatrix:
    """new[:, j] = old[:, perm[j]] via unpack/gather/pack."""
    bits = unpack_bits(m.data, jnp.uint8)  # (rows, width*32)
    out = bits[:, perm]
    return mask_padding(BitMatrix(pack_bits(out), m.ncols))


def apply_p_left(m: BitMatrix, v: jnp.ndarray) -> BitMatrix:
    """Row swaps ascending (reference: mzd_apply_p_left, mzp.c:65)."""
    return permute_rows(m, swaps_to_perm(v[: m.nrows], True))


def apply_p_left_trans(m: BitMatrix, v: jnp.ndarray) -> BitMatrix:
    """Row swaps descending (reference: mzd_apply_p_left_trans, mzp.c:74)."""
    return permute_rows(m, swaps_to_perm(v[: m.nrows], False))


def apply_p_right(m: BitMatrix, v: jnp.ndarray) -> BitMatrix:
    """Column swaps descending (reference: mzd_apply_p_right applies swaps
    from the last index down, mzp.c:252-262)."""
    return permute_cols(m, swaps_to_perm(v[: m.ncols], False))


def apply_p_right_trans(m: BitMatrix, v: jnp.ndarray) -> BitMatrix:
    """Column swaps ascending (reference: mzd_apply_p_right_trans)."""
    return permute_cols(m, swaps_to_perm(v[: m.ncols], True))


def apply_p_right_trans_tri(m: BitMatrix, v: jnp.ndarray) -> BitMatrix:
    """For i ascending: swap columns (i, v[i]) in rows [0, i) only
    (reference: mzd_apply_p_right_trans_tri, mzp.c:279-292).  Moves pivot
    columns onto the diagonal in the triangular region after PLE."""
    n = min(m.ncols, v.shape[0])
    ridx = jnp.arange(m.nrows, dtype=jnp.int32)[:, None]

    def body(i, data):
        a = jnp.int32(i)
        b = v[i]
        wa, sa = a // WORD_BITS, (a % WORD_BITS).astype(jnp.uint32)
        wb, sb = b // WORD_BITS, (b % WORD_BITS).astype(jnp.uint32)
        bits_a = (data[:, wa] >> sa) & 1
        bits_b = (data[:, wb] >> sb) & 1
        diff = (bits_a ^ bits_b) * (ridx[:, 0] < a).astype(jnp.uint32)
        data = data.at[:, wa].set(data[:, wa] ^ (diff << sa))
        data = data.at[:, wb].set(data[:, wb] ^ (diff << sb))
        return data

    data = jax.lax.fori_loop(0, n, body, m.data)
    return BitMatrix(data, m.ncols)
