"""Deep-product GF(2) kernel, v2: unpack each operand word ONCE.

The v1 kernel (ops/pallas_mul.py) iterates (i, j) output tiles and
re-unpacks the B chunk inside every i step: VPU unpack work is
k*n*(m/tm) + k*m*(n/tn) element-ops, which at the measured ~94%-of-peak
MXU int8 dot rate (benches/probe_int4.py: 369/394 Top/s) leaves the
kernel VPU-bound at ~284 of 788 effective Tbit-op/s (n=4096,
benches/probe_mul4096.py).

v2 inverts the loop nest: grid (J, KB) over B chunks, with the chunk
unpacked ONCE into a VMEM int8 cache and an inner double-buffered sweep
over the I row tiles that XORs packed parities straight into the output
in HBM (read-modify-write via manual DMA; the kb == 0 pass skips the
read).  Unpack work drops to k*n + k*m*(n/tn) element-ops — one pass
over B plus an A pass per output column group — and the int32
accumulator never persists across chunks, so the row tile can grow
without blowing VMEM.

Cost model per n=4096 product (tm=256, tkw=32, tnw=128): MXU 175 us,
unpack ~16 us, parity-pack ~30 us, C read-modify-write traffic
2*KB*n^2/8 bytes = 16 MB ~ 20 us; ~2x the v1 rate.  The C round-trips
grow with KB, so very deep contractions amortize them over KB times the
MXU work — still ~5% at n=65536.

Layouts and exactness match v1: A word-transposed and i-tiled, B
plane-row-permuted and j-tiled, padding bits zero.  The hand pipeline
follows ops/pallas_schur.py's dyn kernel (prefetch into the other slot;
drain a slot's previous write-back BEFORE its buffer is reused — waiting
it in the compute step double-decrements the semaphore and deadlocks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import WORD_BITS
from .pallas_mul import (_pack_planes, _plane_dot, _resolve_op_dtype,
                         _round_up, _unpack_planes_ax1)

__all__ = ["gf2_mul_pallas_v2", "TKW2"]

TM2 = 256       # row tile
TKW2 = 32       # contraction words per chunk (tk = 1024 bits)
TNW2 = 128      # output words per column group (tn = 4096 bits)


def _make_kernel_v2(tm: int, tkw: int, tnw: int, I: int, KB: int,
                    dt=jnp.int8):
    tk = tkw * WORD_BITS

    def _kernel(at_hbm, bp_hbm, o_hbm, ubuf, ub_ref, abuf, cin, cout,
                ai_sem, ci_sem, co_sem, ub_sem):
        j = pl.program_id(0)
        kb = pl.program_id(1)
        first = kb == 0

        # --- B chunk: DMA + unpack once per grid step ---
        pltpu.make_async_copy(bp_hbm.at[j, pl.ds(kb * tk, tk), :],
                              ubuf, ub_sem.at[0]).start()

        def a_dma(slot, i):
            return pltpu.make_async_copy(
                at_hbm.at[i, pl.ds(kb * tkw, tkw), :], abuf.at[slot],
                ai_sem.at[slot])

        def c_tile(i):
            return o_hbm.at[pl.ds(i * tm, tm), pl.ds(j * tnw, tnw)]

        def c_dma(slot, i):
            return pltpu.make_async_copy(c_tile(i), cin.at[slot],
                                         ci_sem.at[slot])

        a_dma(0, 0).start()

        @pl.when(~first)
        def _():
            c_dma(0, 0).start()

        pltpu.make_async_copy(bp_hbm.at[j, pl.ds(kb * tk, tk), :],
                              ubuf, ub_sem.at[0]).wait()
        ub_ref[:] = _unpack_planes_ax1(ubuf[:], dt)

        def body(i, carry):
            slot = i % 2

            # prefetch i+1 into the other slot; its outstanding
            # write-back (started at step i-1) must land before the
            # incoming DMAs reuse the buffers
            @pl.when(i + 1 < I)
            def _():
                @pl.when(i >= 1)
                def _():
                    pltpu.make_async_copy(
                        cout.at[1 - slot], c_tile(i - 1),
                        co_sem.at[1 - slot]).wait()

                a_dma(1 - slot, i + 1).start()

                @pl.when(~first)
                def _():
                    c_dma(1 - slot, i + 1).start()

            a_dma(slot, i).wait()
            acc = _plane_dot(abuf[slot], ub_ref[:], dt)
            pk = _pack_planes(acc & 1, tnw)

            @pl.when(first)
            def _():
                cout[slot] = pk

            @pl.when(~first)
            def _():
                c_dma(slot, i).wait()
                cout[slot] = cin[slot] ^ pk

            pltpu.make_async_copy(cout.at[slot], c_tile(i),
                                  co_sem.at[slot]).start()
            return carry

        jax.lax.fori_loop(0, I, body, 0, unroll=False)

        # drain the last two write-backs
        @pl.when(I >= 2)
        def _():
            i = I - 2
            pltpu.make_async_copy(cout.at[i % 2], c_tile(i),
                                  co_sem.at[i % 2]).wait()

        i = I - 1
        pltpu.make_async_copy(cout.at[i % 2], c_tile(i),
                              co_sem.at[i % 2]).wait()

    return _kernel


@functools.partial(jax.jit,
                   static_argnames=("tm", "tkw", "tnw", "interpret",
                                    "op_dtype"))
def _mul2_padded(at3, bp3, tm: int, tkw: int, tnw: int,
                 interpret: bool = False, op_dtype: str = "int8"):
    I, kw_pad, _ = at3.shape
    J, k_pad, _ = bp3.shape
    m = I * tm
    nw = J * tnw
    tk = tkw * WORD_BITS
    tn = tnw * WORD_BITS
    KB = kw_pad // tkw
    return pl.pallas_call(
        _make_kernel_v2(tm, tkw, tnw, I, KB, getattr(jnp, op_dtype)),
        grid=(J, KB),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((m, nw), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((tk, tnw), jnp.uint32),      # packed-B chunk
            pltpu.VMEM((tk, tn), getattr(jnp, op_dtype)),  # unpacked-B cache
            pltpu.VMEM((2, tkw, tm), jnp.uint32),   # A chunk double buffer
            pltpu.VMEM((2, tm, tnw), jnp.uint32),   # C in double buffer
            pltpu.VMEM((2, tm, tnw), jnp.uint32),   # C out double buffer
            pltpu.SemaphoreType.DMA((2,)),          # A in
            pltpu.SemaphoreType.DMA((2,)),          # C in
            pltpu.SemaphoreType.DMA((2,)),          # C out
            pltpu.SemaphoreType.DMA((1,)),          # B chunk
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # the (tk, tn) unpacked-B cache dominates: up to 48 MB at
            # the deepest clamped tkw (gf2_mul_pallas_v2 budgets it),
            # plus chunk/double buffers; the default scoped-vmem cap is
            # 16 MB (v5e has 128 MB VMEM total)
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * (kw_pad * WORD_BITS) * (nw * WORD_BITS),
            bytes_accessed=(kw_pad * m + k_pad * nw
                            + 2 * KB * m * nw) * 4,
            transcendentals=0),
        interpret=interpret,
    )(at3, bp3)


def gf2_mul_pallas_v2(a_data: jnp.ndarray, b_data: jnp.ndarray,
                      tm: int | None = None, tnw: int | None = None,
                      interpret: bool = False,
                      op_dtype: str = "int8",
                      tkw: int | None = None) -> jnp.ndarray:
    """Packed GF(2) product C = A*B, deep-contraction kernel.

    a: uint32[m, kw], b: uint32[k, nw] with k <= kw*32 (padding bits
    zero).  Returns uint32[m, nw].  Same contract as v1's
    gf2_mul_pallas; prefer this engine when the contraction spans
    several chunks (kw > TKW2) — below that v1's resident accumulator
    wins because there is nothing to re-unpack.

    ``tkw`` is the contraction chunk depth in words.  Deeper chunks cut
    the per-(row tile, chunk) parity-pack count and the C
    read-modify-write traffic linearly (both scale with KB = kw/tkw);
    the ceiling is the VMEM B cache (tk x tn at op_dtype width).
    """
    m, kw = a_data.shape
    k, nw = b_data.shape
    op_dtype = _resolve_op_dtype(op_dtype, interpret)
    tm = tm or TM2
    tnw = tnw or TNW2
    if not interpret:
        tm = _round_up(tm, 8)
        if tnw % 128 != 0:
            # lane-align any caller-passed tnw (Mosaic needs 128-lane
            # tiles), clamped to the padded output width
            tnw = min(_round_up(nw, 128), _round_up(tnw, 128))
    if tkw is None:
        # Measured on v5e.  Round-5 driver-grade sweep (probe_tkw2,
        # 4..44-product chains, median of 11 slopes): 4096 tkw 32/64/128
        # = 630.6/699.5/726.8 Tbit-op/s — the short-chain probe_tkw
        # numbers that picked 64 in round 4b sit inside the tunnel's RPC
        # jitter at this size.  8192+: 256 best (r4b sweep: 588/593/656/
        # 696 for 32/64/128/256; 16384: 539/683/688 for 32/128/256).
        # The B cache is tk x tn at op_dtype width (int4: 16 MB at
        # tkw=256, tnw=128), so int8 callers cap one notch lower.
        tkw = (128 if kw <= 128 else 256) if op_dtype == "int4" \
            else (64 if kw <= 128 else 128)
    else:
        tkw = _round_up(tkw, 8)  # Mosaic sublane granularity
    tkw = min(tkw, _round_up(kw, 8))
    # Clamp the VMEM-dominant B cache — (tkw*32, tnw*32) at op_dtype
    # width — to a 48 MB budget under the kernel's 100 MB scoped cap
    # (the packed chunk + A/C double buffers take the rest); an
    # oversized caller tkw otherwise fails deep inside Mosaic.
    bits = 4 if op_dtype == "int4" else 8
    tkw_max = (48 * 1024 * 1024 * 8) // (1024 * tnw * bits)
    tkw = max(8, min(tkw, tkw_max // 8 * 8))
    m_pad = _round_up(m, tm)
    kw_pad = _round_up(kw, tkw)
    k_pad = kw_pad * WORD_BITS
    nw_pad = _round_up(nw, tnw)
    at = jnp.pad(a_data, ((0, m_pad - m), (0, kw_pad - kw))).T
    b = jnp.pad(b_data, ((0, k_pad - k), (0, nw_pad - nw)))
    groups = k_pad // (tkw * WORD_BITS)
    bp = (b.reshape(groups, tkw, WORD_BITS, nw_pad)
           .swapaxes(1, 2)
           .reshape(k_pad, nw_pad))
    at3 = at.reshape(kw_pad, m_pad // tm, tm).swapaxes(0, 1)
    bp3 = bp.reshape(k_pad, nw_pad // tnw, tnw).swapaxes(0, 1)
    out = _mul2_padded(at3, bp3, tm, tkw, tnw, interpret, op_dtype)
    return out[:m, :nw]
