"""Strassen-Winograd multiplication over GF(2).

Reference analogue: strassen.c:41-208 (_mzd_mul_even, Bodrato/Winograd
schedule with 7 recursive products).  Over GF(2), + and - coincide (XOR), so
the operand sums cost one fused elementwise pass each.  Where the reference
peels odd sizes with three M4RM cleanup products (strassen.c:170-204), we pad
dimensions up to the recursion alignment instead — zero padding is exact over
GF(2) and keeps every block MXU-aligned, which is strictly better on TPU than
ragged peeling.

The base case is the int8 MXU multiply (ops/mul.py), so Strassen here is a
*FLOP reducer on top of the MXU*: each level trades 1/8 of the MXU work for
O(n^2) XOR traffic, profitable only for large n (cutoff in utils/config.py,
reference analogue __M4RI_STRASSEN_MUL_CUTOFF strassen.h:133-135).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.config import WORD_BITS, get_config
from .mul import mul_packed_data

__all__ = ["strassen_mul_data"]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _mul_rec(a: jnp.ndarray, b: jnp.ndarray, depth: int) -> jnp.ndarray:
    """a: uint32[M, K/32], b: uint32[K, N/32]; all dims split evenly on word
    boundaries for ``depth`` levels."""
    if depth == 0:
        return mul_packed_data(a, b)
    m2 = a.shape[0] // 2
    kw2 = a.shape[1] // 2
    k2 = b.shape[0] // 2
    nw2 = b.shape[1] // 2
    a11, a12 = a[:m2, :kw2], a[:m2, kw2:]
    a21, a22 = a[m2:, :kw2], a[m2:, kw2:]
    b11, b12 = b[:k2, :nw2], b[:k2, nw2:]
    b21, b22 = b[k2:, :nw2], b[k2:, nw2:]

    s1 = a21 ^ a22
    s2 = s1 ^ a11
    s3 = a11 ^ a21
    s4 = a12 ^ s2
    t1 = b12 ^ b11
    t2 = b22 ^ t1
    t3 = b22 ^ b12
    t4 = t2 ^ b21

    p1 = _mul_rec(a11, b11, depth - 1)
    p2 = _mul_rec(a12, b21, depth - 1)
    p3 = _mul_rec(s4, b22, depth - 1)
    p4 = _mul_rec(a22, t4, depth - 1)
    p5 = _mul_rec(s1, t1, depth - 1)
    p6 = _mul_rec(s2, t2, depth - 1)
    p7 = _mul_rec(s3, t3, depth - 1)

    u2 = p1 ^ p6
    u3 = u2 ^ p7
    u4 = u2 ^ p5
    c11 = p1 ^ p2
    c12 = u4 ^ p3
    c21 = u3 ^ p4
    c22 = u3 ^ p5

    top = jnp.concatenate([c11, c12], axis=1)
    bot = jnp.concatenate([c21, c22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def strassen_mul_data(a_data: jnp.ndarray, b_data: jnp.ndarray,
                      m: int, k: int, n: int,
                      cutoff: int | None = None) -> jnp.ndarray:
    """Packed GF(2) product with Strassen-Winograd recursion on top of the
    MXU base multiply.  Returns uint32[m, ceil(n/32)]."""
    cfg = get_config()
    if cutoff is None:
        cutoff = cfg.strassen_cutoff
    levels = 0
    while (min(m, k, n) >> (levels + 1) >= cutoff
           and levels < cfg.strassen_max_levels):
        levels += 1
    if levels == 0:
        return mul_packed_data(a_data, b_data)
    align = WORD_BITS << levels
    mp = _round_up(m, 1 << levels)
    kp = _round_up(k, align)
    np_ = _round_up(n, align)
    a = jnp.pad(a_data, ((0, mp - m), (0, kp // WORD_BITS - a_data.shape[1])))
    b = jnp.pad(b_data, ((0, kp - k), (0, np_ // WORD_BITS - b_data.shape[1])))
    c = _mul_rec(a, b, levels)
    return c[:m, : (n + WORD_BITS - 1) // WORD_BITS]
