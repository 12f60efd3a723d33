"""GF(2) matrix multiplication.

Two engines:

1. ``mul_naive`` — popcount/parity oracle (reference: mzd_mul_naive,
   mzd.c:1141-1254, built on m4ri_parity64, parity.h:80-125).  Used as the
   independent cross-validation algorithm in tests, exactly as the reference
   test suite cross-checks naive vs M4RM vs Strassen.

2. ``mul`` — the TPU-native engine.  Where the reference's workhorse is the
   M4RM Gray-code table algorithm (brilliantrussian.c:1032-1190, an
   O(n^3/log n) *bandwidth* algorithm designed for CPUs without matrix
   units), the TPU has a 128x128 systolic array whose int8 throughput is
   ~400 Top/s: we unpack bit-words to int8 lanes, multiply on the MXU with
   exact int32 accumulation, and take the parity of the accumulator —
   AND=multiply and XOR=add mod 2, so ``C = (A_int8 @ B_int8) & 1`` is the
   exact GF(2) product.  Everything O(n^2) (unpack / parity / repack) fuses
   into the matmul's prologue/epilogue or rides HBM bandwidth; the O(n^3)
   part runs at MXU speed.  Large operands are processed in row/depth blocks
   so unpacked tiles and the int32 accumulator stay bounded in HBM
   (reference analogue: __M4RI_MUL_BLOCKSIZE babystep/giantstep blocking,
   mzd.h:59); depth-block partial products combine by XOR since
   parity(a+b) = parity(a) ^ parity(b).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bitmatrix import BitMatrix, mask_padding, width_for
from ..core.transpose import transpose
from ..utils.config import WORD_BITS, get_config

__all__ = ["unpack_bits", "pack_bits", "mul_naive", "mul", "addmul",
           "mul_packed_data"]

_SHIFTS = np.arange(WORD_BITS, dtype=np.uint32)


def unpack_bits(data: jnp.ndarray, dtype=jnp.int8) -> jnp.ndarray:
    """uint32[m, w] -> dtype[m, w*32] of 0/1 lanes (column c at lane c)."""
    m, w = data.shape
    bits = (data[:, :, None] >> _SHIFTS[None, None, :]) & jnp.uint32(1)
    return bits.reshape(m, w * WORD_BITS).astype(dtype)


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """0/1 integer [m, n] -> packed uint32[m, ceil(n/32)]."""
    m, n = bits.shape
    w = width_for(n)
    pad = w * WORD_BITS - n
    if pad:
        bits = jnp.pad(bits, ((0, 0), (0, pad)))
    u = bits.reshape(m, w, WORD_BITS).astype(jnp.uint32)
    return jnp.sum(u << _SHIFTS[None, None, :], axis=-1, dtype=jnp.uint32)


def _mxu_dtype():
    return jnp.int8 if get_config().mxu_dtype == "int8" else jnp.bfloat16


def _dot_parity(a_u: jnp.ndarray, b_u: jnp.ndarray) -> jnp.ndarray:
    """(unpacked A) @ (unpacked B) mod 2, packed.  Exact: int8 x int8
    accumulates in int32; bf16 x bf16 in f32 is exact for k <= 2**24."""
    if a_u.dtype == jnp.bfloat16:
        p = jax.lax.dot_general(
            a_u, b_u, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        p = p.astype(jnp.int32)
    else:
        p = jax.lax.dot_general(
            a_u, b_u, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    return pack_bits(p & 1)


def mul_packed_data(a_data: jnp.ndarray, b_data: jnp.ndarray,
                    cfg=None, allow_pallas: bool = True) -> jnp.ndarray:
    """Packed uint32[m, kw] x uint32[k, nw] -> packed uint32[m, nw].

    Requires b_data padding bits to be zero (BitMatrix invariant).  The
    contraction runs over a_data's padded width; A's padding lanes are zero
    so the padded rows of B (all-zero) contribute nothing.

    ``allow_pallas=False`` pins the XLA path; callers that trace this under
    jax.vmap must pass it (the kernel's manual-DMA refs are not
    batch-lowered, and XLA's batched dot is the right tool there anyway).
    """
    if cfg is None:
        cfg = get_config()
    dt = _mxu_dtype()
    m, kw = a_data.shape
    k, nw = b_data.shape
    kp = kw * WORD_BITS

    # Shallow contractions on TPU go through the fused Pallas kernel: the
    # XLA path would materialize an m x n int32 product in HBM — a 32x
    # traffic inflation that dominates when k is small (the Schur updates
    # of the panel factorization have k = panel width = 128).
    if (allow_pallas and cfg.use_pallas_schur and kw <= 32 and m >= 2048
            and nw >= 128 and jax.default_backend() == "tpu"):
        from .pallas_mul import gf2_mul_pallas
        return gf2_mul_pallas(a_data, b_data, op_dtype=cfg.pallas_op_dtype)

    # Large deep products likewise: XLA's single fused dot loses above
    # ~4096 (276 vs 386 Tbit-op/s at n=4096, 37 vs 375 at n=16384) and
    # the blocked XLA path materializes unpacked operands.  Contractions
    # spanning several 1024-bit chunks go through the v2 kernel, which
    # unpacks each B chunk once per column group instead of once per row
    # tile (617 vs 280 Tbit-op/s at n=4096, benches/probe_mul2.py).
    if (allow_pallas and cfg.use_pallas_big and m >= 2048 and nw >= 128
            and max(m, kp, nw * WORD_BITS) >= cfg.pallas_big_min
            and jax.default_backend() == "tpu"):
        # v2 pays off once there is more than one chunk to re-unpack;
        # with the deep-chunk heuristic (tkw=64 at kw<=128) a kw<=64
        # product is a single chunk, where v1's resident accumulator
        # wins (ADVICE r4: the old kw>32 gate reflected tkw=32 defaults)
        from .pallas_mul2 import gf2_mul_pallas_v2
        if cfg.use_pallas_v2 and kw > 64:
            return gf2_mul_pallas_v2(a_data, b_data,
                                     op_dtype=cfg.pallas_op_dtype)
        from .pallas_mul import gf2_mul_pallas
        return gf2_mul_pallas(a_data, b_data, op_dtype=cfg.pallas_op_dtype)

    def block_mul(a_blk, b_blk):
        a_u = unpack_bits(a_blk, dt)
        b_u = unpack_bits(b_blk, dt)
        if b_blk.shape[0] < a_blk.shape[1] * WORD_BITS:
            b_u = jnp.pad(
                b_u, ((0, a_blk.shape[1] * WORD_BITS - b_blk.shape[0]), (0, 0)))
        return _dot_parity(a_u, b_u)

    if max(m, kp, nw * WORD_BITS) <= cfg.mul_block_threshold:
        return block_mul(a_data, b_data)

    # Blocked path: XOR partial parities over depth blocks, tile rows.
    bm, bk = cfg.mul_block_m, cfg.mul_block_k
    bkw = bk // WORD_BITS
    out_rows = []
    for r0 in range(0, m, bm):
        r1 = min(r0 + bm, m)
        acc = jnp.zeros((r1 - r0, nw), jnp.uint32)
        for c0 in range(0, kw, bkw):
            c1 = min(c0 + bkw, kw)
            a_blk = a_data[r0:r1, c0:c1]
            b_blk = b_data[c0 * WORD_BITS : min(c1 * WORD_BITS, k), :]
            acc = acc ^ block_mul(a_blk, b_blk)
        out_rows.append(acc)
    return jnp.concatenate(out_rows, axis=0)


# Top-level jit wrappers for the public mul/addmul dispatch: un-jitted,
# a depth-2 Strassen call issues ~80 eager ops — ~40 ms of tunnel RPC
# EACH on the dev runtime (the same lesson as the round-4 pluq fix).
# mul_packed_data itself stays un-jitted so in-jit callers (the PLE scan,
# TRSM recursions) keep XLA's cross-op fusion.
@jax.jit
def _mul_small_jit(a_data, b_data):
    return mul_packed_data(a_data, b_data)


@jax.jit
def _addmul_small_jit(c_data, a_data, b_data):
    return c_data ^ mul_packed_data(a_data, b_data)


def _is_sqr(a: BitMatrix, b: BitMatrix) -> bool:
    """Same-operand detection (reference: mzd_mul dispatches A == B to the
    squaring specialization, strassen.c:358-364).  In the functional world
    'the same matrix' means the same underlying buffer."""
    return a.data is b.data or a is b


def mul(a: BitMatrix, b: BitMatrix) -> BitMatrix:
    """C = A*B over GF(2) (reference API: mzd_mul, strassen.c:345)."""
    assert a.ncols == b.nrows, (a.shape, b.shape)
    from .strassen import strassen_mul_data, strassen_sqr_data
    cfg = get_config()
    if min(a.nrows, a.ncols, b.ncols) >= cfg.strassen_cutoff * 2:
        if _is_sqr(a, b):
            out = strassen_sqr_data(a.data, a.ncols)
        else:
            out = strassen_mul_data(a.data, b.data, a.nrows, a.ncols, b.ncols)
    else:
        out = _mul_small_jit(a.data, b.data)
    return BitMatrix(out, b.ncols)


def addmul(c: BitMatrix, a: BitMatrix, b: BitMatrix) -> BitMatrix:
    """C += A*B (reference API: mzd_addmul, strassen.c:675): the Strassen
    range uses the fused-accumulate schedule (no full-product temporary);
    below it the XOR fuses into the product's epilogue under jit."""
    from .strassen import strassen_addmul_data, strassen_addsqr_data
    cfg = get_config()
    if min(a.nrows, a.ncols, b.ncols) >= cfg.strassen_cutoff * 2:
        if _is_sqr(a, b):
            out = strassen_addsqr_data(c.data, a.data, a.ncols)
        else:
            out = strassen_addmul_data(c.data, a.data, b.data,
                                       a.nrows, a.ncols, b.ncols)
        return BitMatrix(out, c.ncols)
    return BitMatrix(_addmul_small_jit(c.data, a.data, b.data), c.ncols)


def mul_naive(a: BitMatrix, b: BitMatrix, chunk: int = 1024) -> BitMatrix:
    """Cubic popcount-parity oracle (reference: mzd_mul_naive, mzd.c:1141).

    C[i, j] = parity(popcount_w(A[i, w] & B^T[j, w])).  Independent of the
    MXU path — used for cross-validation.
    """
    assert a.ncols == b.nrows
    bt = transpose(b)  # (n, kw)
    m = a.nrows
    outs = []
    for r0 in range(0, m, chunk):
        blk = a.data[r0 : r0 + chunk]  # (mb, kw)
        cnt = jnp.sum(
            jax.lax.population_count(blk[:, None, :] & bt.data[None, :, :]),
            axis=-1, dtype=jnp.int32)
        outs.append(pack_bits(cnt & 1))
    return BitMatrix(jnp.concatenate(outs, axis=0), b.ncols)
