"""Fused Pallas GF(2) matmul kernel: packed uint32 in, packed uint32 out.

The XLA path (ops/mul.py) materializes the unpacked int8 operands and the
int32 product in HBM — an 8x/32x traffic inflation that dominates when the
contraction is shallow (e.g. the k=128 Schur updates of the panel
factorization).  This kernel keeps everything on-chip:

    HBM:  A^T packed (K/32, M)   B packed (K, N/32)   C packed (M, N/32)
    VMEM: unpack -> int8 -> MXU dot_general (int32 acc) -> parity -> pack

Design notes (all verified on TPU v5e):
- Packed blocks must have a last dimension divisible by 128 (Mosaic tiling),
  which a 32x-compressed word axis rarely satisfies — so A is stored
  *word-transposed* (K/32, M): k-chunks become sublane slices, fetched with
  manual double-buffered DMA, and the MXU contracts dimension 0 of both
  operands natively.
- Unpacking uses the bit-plane layout: 32 static concat slices, no
  per-lane variable shifts.  The induced lane permutation on the
  contraction axis is compensated by pre-permuting B's rows once outside
  the kernel; on the output axis it is exactly inverted by the same-layout
  pack, so C emerges in standard packing.
- Mosaic miscompiles scalar-constant LEFT shifts >= ~17 on uint32; packing
  therefore multiplies by 2^s (bit-exact, verified).
"""

from __future__ import annotations

import functools
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import WORD_BITS

__all__ = ["gf2_mul_pallas"]

TM = 256        # output row tile (default)
TKW = 32        # contraction words per chunk (default; TK = 1024 bits)
TNW = 128       # output words per tile (TN = 4096 bits)


def _unpack_planes_ax1(p, dt=jnp.int8):
    """uint32 (R, W) -> (R, 32W): lane s*W + w holds bit s of word w."""
    return jnp.concatenate(
        [((p >> s) & 1).astype(dt) for s in range(WORD_BITS)], axis=1)


def _unpack_planes_ax0(p, dt=jnp.int8):
    """uint32 (W, C) -> (32W, C): row s*W + w holds bit s of word w."""
    return jnp.concatenate(
        [((p >> s) & 1).astype(dt) for s in range(WORD_BITS)], axis=0)


def _pack_planes(bits, w):
    """0/1 int32 (R, 32w) -> uint32 (R, w); inverse of _unpack_planes_ax1."""
    out = jnp.zeros((bits.shape[0], w), jnp.uint32)
    for s in range(WORD_BITS):
        out = out + bits[:, s * w : (s + 1) * w].astype(jnp.uint32) \
            * jnp.uint32(1 << s)
    return out


def _plane_dot(a_chunk, ub, dt):
    """MXU product of a word-transposed packed A chunk (tkw, tm) uint32
    against an unpacked B chunk (tk, tn): returns int32 (tm, tn).

    int8 contracts dimension 0 of both operands (the layout Mosaic lowers
    natively).  int4 cannot: Mosaic has no i4 vector transpose, so the
    transposed-LHS form is rejected ("Unsupported type in transpose") —
    instead transpose the still-PACKED uint32 chunk (32-bit transposes are
    supported) and unpack along axis 1, which lands the identical
    plane-lane order s*tkw + w, then contract in standard layout."""
    if dt == jnp.int4:
        ua = _unpack_planes_ax1(a_chunk[:].T, dt)     # (tm, tk)
        return jax.lax.dot_general(
            ua, ub, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    ua_t = _unpack_planes_ax0(a_chunk[:], dt)         # (tk, tm)
    return jax.lax.dot_general(
        ua_t, ub, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def _resolve_op_dtype(op_dtype: str, interpret: bool) -> str:
    """Interpret mode runs on CPU XLA, which rejects int4 dots — execute
    in int8 there (the kernels are bit-exact in either dtype)."""
    if interpret and op_dtype == "int4":
        return "int8"
    return op_dtype


def _make_kernel(tm: int, tkw: int, tnw: int, dt=jnp.int8):
    tk = tkw * WORD_BITS
    tn = tnw * WORD_BITS

    def _kernel(at_hbm, bp_hbm, o_ref, abuf, bbuf, sems):
        # Operands arrive i/j-tiled — at: (I, kw, tm), bp: (J, k, tnw) — so
        # every DMA below reads a fully CONTIGUOUS chunk.  With the flat 2-D
        # layouts the strided row reads (512 B useful per 8 KB stride at
        # n=65536) collapsed DMA throughput ~16x.
        i = pl.program_id(0)
        j = pl.program_id(1)
        kw_tot = at_hbm.shape[1]
        n_chunks = kw_tot // tkw

        def a_dma(slot, kb):
            return pltpu.make_async_copy(
                at_hbm.at[i, pl.ds(kb * tkw, tkw), :],
                abuf.at[slot], sems.at[slot, 0])

        def b_dma(slot, kb):
            return pltpu.make_async_copy(
                bp_hbm.at[j, pl.ds(kb * tk, tk), :],
                bbuf.at[slot], sems.at[slot, 1])

        a_dma(0, 0).start()
        b_dma(0, 0).start()

        def body(kb, acc):
            slot = jax.lax.rem(kb, 2)
            nxt = jax.lax.rem(kb + 1, 2)

            @pl.when(kb + 1 < n_chunks)
            def _():
                a_dma(nxt, kb + 1).start()
                b_dma(nxt, kb + 1).start()

            a_dma(slot, kb).wait()
            b_dma(slot, kb).wait()
            ub = _unpack_planes_ax1(bbuf[slot], dt)     # (tk, tn)
            return acc + _plane_dot(abuf[slot], ub, dt)

        acc = jax.lax.fori_loop(
            0, n_chunks, body, jnp.zeros((tm, tn), jnp.int32))
        o_ref[:] = _pack_planes(acc & 1, tnw)

    return _kernel


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _clamp_tiles(tm: int, tnw: int, nw: int) -> tuple[int, int]:
    """Mosaic requires the out-block dims to be (divisible by 8, divisible
    by 128 words) or to span the whole (padded) array; a tile narrower than
    the matrix and not 128-word aligned would be rejected at lowering, so
    clamp up front (the interpreter accepts any tiling and skips this)."""
    tm = _round_up(tm, 8)
    if tnw % 128 != 0 and tnw < nw:
        tnw = min(_round_up(nw, 128), _round_up(tnw, 128))
    return tm, tnw


@functools.partial(jax.jit, static_argnames=("tm", "tkw", "tnw", "interpret",
                                             "op_dtype"))
def _mul_padded(at, bp, tm: int, tkw: int, tnw: int,
                interpret: bool = False, op_dtype: str = "int8"):
    n_i, kw_pad, _ = at.shape
    n_j, k_pad, _ = bp.shape
    m = n_i * tm
    nw = n_j * tnw
    tk = tkw * WORD_BITS
    grid = (m // tm, nw // tnw)
    return pl.pallas_call(
        _make_kernel(tm, tkw, tnw, getattr(jnp, op_dtype)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tm, tnw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, nw), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((2, tkw, tm), jnp.uint32),
            pltpu.VMEM((2, tk, tnw), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # unpack intermediates can exceed the 16 MB default scoped-vmem
            # cap (v5e has 128 MB VMEM)
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * (kw_pad * WORD_BITS) * (nw * WORD_BITS),
            bytes_accessed=(kw_pad * m + k_pad * nw + m * nw) * 4,
            transcendentals=0),
        interpret=interpret,
    )(at, bp)


# ---- per-shape tile autotune cache (reference analogue: configure-time
# cache detection feeding __M4RI_MUL_BLOCKSIZE; here measured tiles keyed
# by pow2-bucketed shape, persisted as JSON) ----

_TUNE_PATH = os.environ.get(
    "M4RI_TPU_AUTOTUNE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "m4ri_tpu",
                 "autotune.json"))
_TUNE: dict | None = None


def _bucket(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def _tune_key(m: int, kw: int, nw: int) -> str:
    return f"{_bucket(m)}x{_bucket(kw)}x{_bucket(nw)}"


def _tune_cache() -> dict:
    global _TUNE
    if _TUNE is None:
        try:
            with open(_TUNE_PATH) as f:
                _TUNE = json.load(f)
        except (OSError, ValueError):
            _TUNE = {}
    return _TUNE


def autotune(m: int, k: int, n: int, candidates=None, reps: int = 3):
    """Measure the kernel over candidate (tm, tnw) tiles for this shape
    bucket and persist the winner.  Returns the chosen (tm, tnw).

    Timing protocol: each candidate is timed as the SLOPE between two
    jitted product chains (lengths lo/hi), the same differencing bench.py
    uses — a single dispatch through the dev tunnel carries ~40 ms of RPC
    latency, which drowns the ~0.1 ms differences between tiles (the
    round-2 autotuner timed single dispatches and was picking from that
    noise)."""
    import time
    kw, nw = (k + 31) // WORD_BITS, (n + 31) // WORD_BITS
    if candidates is None:
        candidates = [(128, 128), (256, 128), (384, 128), (512, 128),
                      (256, 256)]
    a = jax.random.bits(jax.random.PRNGKey(0), (m, kw), dtype=jnp.uint32)
    b = jax.random.bits(jax.random.PRNGKey(1), (k, nw), dtype=jnp.uint32)
    # a chain needs square-ish shapes to feed C back as A; otherwise fall
    # back to repeated independent products (still amortizes RPC)
    chainable = (m, kw) == (k, nw)
    per_s = 2.0 * m * k * n  # bit-ops per product
    lo = 2
    # size hi so the whole chain stays ~0.2-1 s on chip (assume >=100T)
    hi = lo + max(4, min(40, int(0.25e12 * 100 / max(per_s, 1))))

    @functools.partial(jax.jit, static_argnames=("iters", "tm", "tnw"))
    def chain(a, b, iters, tm, tnw):
        x = a
        for _ in range(iters):
            c = gf2_mul_pallas(x, b, tm=tm, tnw=tnw)
            # serial data dependence between links (without it XLA would
            # CSE the repeated identical products into one)
            x = c if chainable else (a ^ c[:1, :1])
        return x[:8, :8]

    # dedupe by the tile the lowering clamp will actually run, and record
    # that effective tile, so the persisted cache never lies about what
    # was measured
    seen = set()
    effective = []
    for tm, tnw in candidates:
        eff = _clamp_tiles(tm, tnw, nw)
        if eff not in seen:
            seen.add(eff)
            effective.append(eff)
    best, best_t = None, float("inf")
    for tm, tnw in effective:
        def run(iters, tm=tm, tnw=tnw):
            jax.device_get(chain(a, b, iters, tm, tnw))
        try:
            run(lo)  # compile + warm; skip infeasible tilings
            run(hi)
        except Exception:
            continue
        slopes = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run(lo)
            t1 = time.perf_counter()
            run(hi)
            t2 = time.perf_counter()
            slopes.append(((t2 - t1) - (t1 - t0)) / (hi - lo))
        t = min(slopes)
        if t < best_t:
            best, best_t = (tm, tnw), t
    if best is not None:
        cache = _tune_cache()
        cache[_tune_key(m, kw, nw)] = list(best)
        try:
            os.makedirs(os.path.dirname(_TUNE_PATH), exist_ok=True)
            with open(_TUNE_PATH, "w") as f:
                json.dump(cache, f, indent=0, sort_keys=True)
        except OSError:
            pass
    return best


def gf2_mul_pallas(a_data: jnp.ndarray, b_data: jnp.ndarray,
                   tm: int | None = None, tnw: int | None = None,
                   interpret: bool = False,
                   op_dtype: str = "int8") -> jnp.ndarray:
    """Packed GF(2) product C = A*B.  a: uint32[m, kw], b: uint32[k, nw]
    with k <= kw*32 (padding bits zero).  Returns uint32[m, nw].

    The contraction chunk adapts to shallow k (no padding waste for the
    panel-factorization Schur updates where kw = 4); tm/tnw default to
    the autotune cache entry for this shape bucket, else (TM, TNW)."""
    m, kw = a_data.shape
    k, nw = b_data.shape
    if tm is None or tnw is None:
        hit = _tune_cache().get(_tune_key(m, kw, nw))
        if hit:
            tm = tm or int(hit[0])
            tnw = tnw or int(hit[1])
        tm = tm or TM
        tnw = tnw or TNW
    op_dtype = _resolve_op_dtype(op_dtype, interpret)
    if not interpret:
        tm, tnw = _clamp_tiles(tm, tnw, nw)
    # tkw must stay 8-sublane aligned: the kernel DMAs (tkw, tm) slices of
    # the word-transposed A, and Mosaic rejects sublane slices not aligned
    # to the (8, 128) tiling (seen at kw=5, i.e. 150-column operands).
    tkw = min(TKW, _round_up(kw, 8))
    m_pad = _round_up(m, tm)
    kw_pad = _round_up(kw, tkw)
    k_pad = kw_pad * WORD_BITS
    nw_pad = _round_up(nw, tnw)
    at = jnp.pad(a_data, ((0, m_pad - m), (0, kw_pad - kw))).T
    b = jnp.pad(b_data, ((0, k_pad - k), (0, nw_pad - nw)))
    # The per-group row permutation l -> 32*(l % tkw) + l//tkw is a
    # reshape+transpose (a fast copy), NOT a gather — large row gathers
    # cost seconds on TPU and dominated single calls at n >= 32768.
    groups = k_pad // (tkw * WORD_BITS)
    bp = (b.reshape(groups, tkw, WORD_BITS, nw_pad)
           .swapaxes(1, 2)
           .reshape(k_pad, nw_pad))
    # i/j-tile both operands so the kernel's DMA chunks are contiguous.
    at3 = at.reshape(kw_pad, m_pad // tm, tm).swapaxes(0, 1)
    bp3 = bp.reshape(k_pad, nw_pad // tnw, tnw).swapaxes(0, 1)
    out = _mul_padded(at3, bp3, tm, tkw, tnw, interpret, op_dtype)
    return out[:m, :nw]
