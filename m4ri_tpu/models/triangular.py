"""Triangular solve (TRSM, 4 variants) and triangular inverse (TRTRI).

Reference analogue: triangular.c (recursive 2x2 TRSM in all four
upper/lower x left/right variants, base cases via parity dot products or
Gray-code tables, triangular_russian.c) and mzd_trtri_upper
(triangular.c:518-546).

TPU-first design: over GF(2) an invertible triangular matrix is unit
triangular, i.e. T = I + N with N strictly triangular and nilpotent, so

    T^{-1} = I + N + N^2 + ... = prod_k (I + N^(2^k))

which we evaluate with log2(n) GF(2) matmuls — the *entire* sequential
substitution of the reference's base cases collapses into a handful of MXU
products.  TRTRI recurses 2x2 on word-aligned halves ([A B; 0 D]^{-1} =
[Ai, Ai B Di; 0, Di]); TRSM variants are then single multiplications by the
inverse, keeping all O(n^3) work on the systolic array.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.bitmatrix import BitMatrix, mask_padding, width_for
from ..ops.mul import mul, mul_packed_data
from ..utils.config import WORD_BITS

__all__ = ["trtri_upper", "trtri_lower", "trsm_upper_left",
           "trsm_lower_left", "trsm_upper_right", "trsm_lower_right"]

_BASE = 512


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _identity_data(n: int) -> jnp.ndarray:
    from ..core.bitmatrix import identity
    return identity(n).data


def _tri_inv_base(tdata: jnp.ndarray, n: int) -> jnp.ndarray:
    """Invert unit-triangular packed n x n via the nilpotent series."""
    eye = _identity_data(n)
    nil = tdata ^ eye
    s = tdata  # I + N: covers N^0, N^1
    p = nil
    steps = max(0, (n - 1).bit_length() - 1)
    for _ in range(steps):
        p = mul_packed_data(p, p)  # N^(2^k) squared
        s = s ^ mul_packed_data(p, s)
    return s


def _split(n: int) -> int:
    return _round_up(n // 2, WORD_BITS)


def _trtri(t: BitMatrix, upper: bool) -> BitMatrix:
    n = t.ncols
    assert t.nrows == n
    if n <= _BASE:
        return mask_padding(BitMatrix(_tri_inv_base(t.data, n), n))
    n1 = _split(n)
    w1 = n1 // WORD_BITS
    from ..core.bitmatrix import submatrix
    a = submatrix(t, 0, 0, n1, n1)
    d = submatrix(t, n1, n1, n, n)
    ai = _trtri(a, upper)
    di = _trtri(d, upper)
    if upper:
        b = submatrix(t, 0, n1, n1, n)
        tr = mul(mul(ai, b), di)  # Ai B Di (n1 x n2)
        top = jnp.concatenate(
            [ai.data, jnp.pad(tr.data, ((0, 0), (0, 0)))], axis=1)
        bot = jnp.concatenate(
            [jnp.zeros((n - n1, w1), jnp.uint32), di.data], axis=1)
    else:
        c = submatrix(t, n1, 0, n, n1)
        bl = mul(mul(di, c), ai)  # Di C Ai (n2 x n1)
        top = jnp.concatenate(
            [ai.data, jnp.zeros((n1, width_for(n - n1)), jnp.uint32)], axis=1)
        bot = jnp.concatenate([bl.data, di.data], axis=1)
    return mask_padding(BitMatrix(jnp.concatenate([top, bot], axis=0), n))


# Public entry points are jitted: the recursion is O(log n) levels of
# multiplies, and un-jitted each would dispatch separately (the dev tunnel
# charges ~40 ms per dispatch).


@jax.jit
def trtri_upper(t: BitMatrix) -> BitMatrix:
    """U^{-1} for unit upper triangular U (reference: mzd_trtri_upper)."""
    return _trtri(t, True)


@jax.jit
def trtri_lower(t: BitMatrix) -> BitMatrix:
    """L^{-1} for unit lower triangular L."""
    return _trtri(t, False)


@jax.jit
def trsm_upper_left(u: BitMatrix, b: BitMatrix) -> BitMatrix:
    """Solve U X = B, i.e. X = U^{-1} B (reference: mzd_trsm_upper_left,
    triangular.c:457-516)."""
    assert u.nrows == u.ncols == b.nrows
    return mul(_trtri(u, True), b)


@jax.jit
def trsm_lower_left(l: BitMatrix, b: BitMatrix) -> BitMatrix:
    """Solve L X = B (reference: mzd_trsm_lower_left, triangular.c:396-451)."""
    assert l.nrows == l.ncols == b.nrows
    return mul(_trtri(l, False), b)


@jax.jit
def trsm_upper_right(u: BitMatrix, b: BitMatrix) -> BitMatrix:
    """Solve X U = B, i.e. X = B U^{-1} (reference: mzd_trsm_upper_right,
    triangular.c:41-111)."""
    assert u.nrows == u.ncols == b.ncols
    return mul(b, _trtri(u, True))


@jax.jit
def trsm_lower_right(l: BitMatrix, b: BitMatrix) -> BitMatrix:
    """Solve X L = B (reference: mzd_trsm_lower_right, triangular.c:301-390)."""
    assert l.nrows == l.ncols == b.ncols
    return mul(b, _trtri(l, False))
