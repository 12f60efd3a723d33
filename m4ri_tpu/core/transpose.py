"""Bit-matrix transpose.

Reference analogue: the transpose family in mzd.c:236-1139 — 64x64 butterfly
with 6 shift/mask stages plus a cache-oblivious block walker.  With 32-bit
words the butterfly needs 5 stages, and instead of a hand-scheduled recursion
we vectorize the butterfly across *all* 32x32 tiles at once and let XLA tile
the word-level transpose; the whole thing is a handful of fused elementwise
ops plus one array transpose.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.config import WORD_BITS
from .bitmatrix import BitMatrix, mask_padding, width_for

_STAGES = (
    (16, np.uint32(0x0000FFFF)),
    (8, np.uint32(0x00FF00FF)),
    (4, np.uint32(0x0F0F0F0F)),
    (2, np.uint32(0x33333333)),
    (1, np.uint32(0x55555555)),
)


def _transpose32_tiles(x: jnp.ndarray) -> jnp.ndarray:
    """Bit-transpose 32x32 tiles.

    ``x`` has shape (..., 32, w): axis -2 indexes tile rows r, each uint32
    word holds bits s (LSB-first).  Returns same shape where axis -2 indexes
    bit position s and bit r of each word is the original (r, s) bit.
    Classic butterfly (reference: _mzd_copy_transpose_64x64, mzd.c:249-309),
    vectorized over all leading axes.
    """
    lead = x.shape[:-2]
    w = x.shape[-1]
    for j, m in _STAGES:
        xr = x.reshape(lead + (32 // (2 * j), 2, j, w))
        a = xr[..., 0, :, :]  # tile rows with (r & j) == 0
        b = xr[..., 1, :, :]  # tile rows with (r & j) == j
        t = ((a >> np.uint32(j)) ^ b) & m
        a = a ^ (t << np.uint32(j))
        b = b ^ t
        x = jnp.stack([a, b], axis=-3).reshape(lead + (32, w))
    return x


def transpose(mat: BitMatrix) -> BitMatrix:
    """B = A^T (reference: mzd_transpose, mzd.c:1118-1139)."""
    nr, nc, w = mat.nrows, mat.ncols, mat.width
    mr = (nr + WORD_BITS - 1) // WORD_BITS
    data = mat.data
    if mr * WORD_BITS != nr:
        data = jnp.pad(data, ((0, mr * WORD_BITS - nr), (0, 0)))
    tiles = data.reshape(mr, WORD_BITS, w)
    u = _transpose32_tiles(tiles)  # (mr, 32, w): [a, s, b] bit r = A(32a+r, 32b+s)
    out = jnp.transpose(u, (2, 1, 0)).reshape(w * WORD_BITS, mr)
    out = out[:nc, : width_for(nr)]
    return mask_padding(BitMatrix(out, nr))
