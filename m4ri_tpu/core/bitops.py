"""Reference-parity matrix helpers on top of BitMatrix.

Covers the remaining mzd_* API surface: multi-bit field access
(mzd_read_bits / mzd_xor_bits / mzd_and_bits / mzd_clear_bits,
mzd.h:472-523, 892-901), row combination (mzd_row_add,
mzd_row_add_offset), triangle extraction (mzd_extract_u / mzd_extract_l,
mzd.c:1843-1866), pivot search (mzd_find_pivot, mzd.c:1661-1776), and
set_ui (mzd_set_ui)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.config import WORD_BITS
from .bitmatrix import BitMatrix, identity, mask_padding, submatrix

__all__ = [
    "read_bits", "xor_bits", "and_bits", "clear_bits", "row_add",
    "row_add_offset", "extract_u", "extract_l", "find_pivot", "set_ui",
    "copy",
]


def _field(j, width_bits):
    """(word, shift) pair for a bit offset; field must fit in 2 words."""
    j = jnp.asarray(j)
    return j // WORD_BITS, (j % WORD_BITS).astype(jnp.uint32)


def read_bits(m: BitMatrix, i, j, n_bits: int) -> jax.Array:
    """n_bits <= 32 bits of row i starting at column j (mzd_read_bits)."""
    assert n_bits <= WORD_BITS
    w, s = _field(j, n_bits)
    lo = m.data[i, w] >> s
    hi_idx = jnp.minimum(w + 1, m.width - 1)
    hi = jnp.where(s > 0, m.data[i, hi_idx] << (WORD_BITS - jnp.maximum(s, 1)),
                   jnp.uint32(0))
    val = lo | jnp.where(w + 1 < m.width, hi, jnp.uint32(0))
    mask = jnp.uint32(0xFFFFFFFF) if n_bits == WORD_BITS else \
        jnp.uint32((1 << n_bits) - 1)
    return val & mask


def _apply_bits(m: BitMatrix, i, j, n_bits: int, values, op) -> BitMatrix:
    w, s = _field(j, n_bits)
    values = jnp.asarray(values, jnp.uint32)
    mask = jnp.uint32(0xFFFFFFFF) if n_bits == WORD_BITS else \
        jnp.uint32((1 << n_bits) - 1)
    values = values & mask
    data = m.data
    lo_old = data[i, w]
    data = data.at[i, w].set(op(lo_old, values << s, mask << s))
    hi_bits = jnp.where(s > 0, n_bits - (WORD_BITS - s), 0)

    def with_hi(data):
        hm = (mask >> (WORD_BITS - jnp.maximum(s, 1)))
        hv = values >> (WORD_BITS - jnp.maximum(s, 1))
        old = data[i, w + 1]
        return data.at[i, w + 1].set(op(old, hv, hm))

    if m.width > 1:
        data = jax.lax.cond(hi_bits > 0, with_hi, lambda d: d, data)
    return BitMatrix(data, m.ncols)


def xor_bits(m: BitMatrix, i, j, n_bits: int, values) -> BitMatrix:
    return _apply_bits(m, i, j, n_bits, values,
                       lambda old, v, msk: old ^ v)


def and_bits(m: BitMatrix, i, j, n_bits: int, values) -> BitMatrix:
    return _apply_bits(m, i, j, n_bits, values,
                       lambda old, v, msk: old & (v | ~msk))


def clear_bits(m: BitMatrix, i, j, n_bits: int) -> BitMatrix:
    return _apply_bits(m, i, j, n_bits, 0,
                       lambda old, v, msk: old & ~msk)


def row_add(m: BitMatrix, src, dst) -> BitMatrix:
    """row[dst] ^= row[src] (mzd_row_add)."""
    return BitMatrix(m.data.at[dst].set(m.data[dst] ^ m.data[src]), m.ncols)


def row_add_offset(m: BitMatrix, dst, src, offset: int) -> BitMatrix:
    """row[dst] ^= row[src] restricted to columns >= offset
    (mzd_row_add_offset, mzd.h:537)."""
    offset = jnp.asarray(offset)
    w0, s = offset // WORD_BITS, (offset % WORD_BITS).astype(jnp.uint32)
    widx = jnp.arange(m.width)
    wmask = jnp.where(
        widx > w0, jnp.uint32(0xFFFFFFFF),
        jnp.where(widx == w0, jnp.uint32(0xFFFFFFFF) << s, jnp.uint32(0)))
    return BitMatrix(m.data.at[dst].set(m.data[dst] ^ (m.data[src] & wmask)),
                     m.ncols)


def extract_u(m: BitMatrix) -> BitMatrix:
    """Upper-triangular k x k submatrix, k = min(m, n) (mzd_extract_u)."""
    k = min(m.nrows, m.ncols)
    s = submatrix(m, 0, 0, k, k)
    i = jnp.arange(k)
    keep = _triangle_mask(k, upper=True)
    return mask_padding(BitMatrix(s.data & keep, k))


def extract_l(m: BitMatrix) -> BitMatrix:
    """Lower-triangular k x k submatrix (mzd_extract_l)."""
    k = min(m.nrows, m.ncols)
    s = submatrix(m, 0, 0, k, k)
    keep = _triangle_mask(k, upper=False)
    return mask_padding(BitMatrix(s.data & keep, k))


def _triangle_mask(k: int, upper: bool) -> jnp.ndarray:
    """Packed uint32[k, width(k)] mask of the (inclusive) triangle."""
    from .bitmatrix import width_for
    w = width_for(k)
    rows = jnp.arange(k, dtype=jnp.int32)[:, None]
    words = jnp.arange(w, dtype=jnp.int32)[None, :]
    base = words * WORD_BITS
    if upper:
        # keep columns >= row: word fully kept if base >= row; partial when
        # row in [base, base+32)
        sh = jnp.clip(rows - base, 0, WORD_BITS).astype(jnp.uint32)
        full = jnp.uint32(0xFFFFFFFF)
        partial = jnp.where(sh >= WORD_BITS, jnp.uint32(0), full << sh)
        return partial
    else:
        # keep columns <= row
        sh = jnp.clip(rows - base + 1, 0, WORD_BITS).astype(jnp.uint32)
        partial = jnp.where(
            sh >= WORD_BITS, jnp.uint32(0xFFFFFFFF),
            ~(jnp.uint32(0xFFFFFFFF) << sh))
        return jnp.where(sh <= 0, jnp.uint32(0), partial)


def find_pivot(m: BitMatrix, start_row, start_col):
    """First (i, j) with bit 1, scanning columns left-to-right from
    (start_row, start_col), rows >= start_row (mzd_find_pivot semantics).
    Returns (found, i, j)."""
    from ..ops.mul import unpack_bits
    bits = unpack_bits(m.data, jnp.uint8)[:, : m.ncols]
    ridx = jnp.arange(m.nrows)[:, None]
    cidx = jnp.arange(m.ncols)[None, :]
    valid = (ridx >= start_row) & (cidx >= start_col) & (bits == 1)
    anyc = jnp.any(valid, axis=0)
    found = jnp.any(anyc)
    j = jnp.argmax(anyc)
    i = jnp.argmax(valid[:, j])
    return found, i.astype(jnp.int32), j.astype(jnp.int32)


def set_ui(m: BitMatrix, value: int) -> BitMatrix:
    """Zero the matrix and set the main diagonal to value&1 (mzd_set_ui)."""
    if not (value & 1):
        return BitMatrix(jnp.zeros_like(m.data), m.ncols)
    rows = jnp.arange(m.nrows, dtype=jnp.uint32)[:, None]
    words = jnp.arange(m.width, dtype=jnp.uint32)[None, :]
    data = jnp.where(
        (rows // WORD_BITS == words) & (rows < m.ncols),
        jnp.uint32(1) << (rows % WORD_BITS), jnp.uint32(0))
    return mask_padding(BitMatrix(data, m.ncols))


def copy(m: BitMatrix) -> BitMatrix:
    return BitMatrix(m.data, m.ncols)


def copy_row(m: BitMatrix, dst, src_mat: BitMatrix, src) -> BitMatrix:
    """row[dst] = src_mat.row[src] (mzd_copy_row)."""
    return BitMatrix(m.data.at[dst].set(src_mat.data[src]), m.ncols)


def row_clear_offset(m: BitMatrix, row, offset) -> BitMatrix:
    """Zero row bits at columns >= offset (mzd_row_clear_offset)."""
    offset = jnp.asarray(offset)
    w0, s = offset // WORD_BITS, (offset % WORD_BITS).astype(jnp.uint32)
    widx = jnp.arange(m.width)
    keep = jnp.where(
        widx < w0, jnp.uint32(0xFFFFFFFF),
        jnp.where(widx == w0, ~(jnp.uint32(0xFFFFFFFF) << s), jnp.uint32(0)))
    return BitMatrix(m.data.at[row].set(m.data[row] & keep), m.ncols)


def row_combine(m: BitMatrix, dst, srcs) -> BitMatrix:
    """row[dst] = XOR of the listed source rows (reference analogue:
    _mzd_combine_N, xor.h:96-122 — the N-ary XOR kernel family)."""
    acc = jnp.zeros((m.width,), jnp.uint32)
    for s in srcs:
        acc = acc ^ m.data[s]
    return BitMatrix(m.data.at[dst].set(acc), m.ncols)


def cmp(a: BitMatrix, b: BitMatrix) -> jax.Array:
    """Lexicographic compare like mzd_cmp (mzd.c:1333-1361): -1/0/1 with
    rows scanned top-down and, *within* a row, the high-index word most
    significant ("columns with larger index are larger").  Reversing the
    32-bit words per row reproduces the reference's 64-bit-word order
    exactly: a 64-bit compare looks at its high half (our word 2j+1)
    before its low half (our word 2j)."""
    assert a.shape == b.shape
    fa = a.data[:, ::-1].reshape(-1)
    fb = b.data[:, ::-1].reshape(-1)
    diff = fa != fb
    any_diff = jnp.any(diff)
    first = jnp.argmax(diff)
    va, vb = fa[first], fb[first]
    return jnp.where(~any_diff, 0, jnp.where(va < vb, -1, 1)).astype(jnp.int32)


def first_zero_row(m: BitMatrix) -> jax.Array:
    """Index of the first all-zero row scanning from the BOTTOM up, i.e.
    the number of leading nonzero rows if the zero rows form a tail
    (mzd_first_zero_row, mzd.c semantics: rows after it are all zero)."""
    nonzero = jnp.any(m.data != 0, axis=1)
    # last nonzero row index + 1 (0 if all zero)
    idx = jnp.arange(m.nrows, dtype=jnp.int32)
    last_nz = jnp.max(jnp.where(nonzero, idx + 1, 0))
    return last_nz
