"""Blocked PLE / PLUQ factorization over GF(2).

Reference analogue: ple.c (block-recursive PLE), ple_russian.c (MMPF
Gray-code basecase).  The reference's design is a cache-driven recursion with
a sequential Gray-table basecase; the TPU-native design is a *panel
factorization with MXU Schur updates*:

- The matrix is swept in static column panels of width NB.  Within a panel,
  a fori_loop performs the canonical pivot hunt (columns left to right, first
  row >= rank with a 1 — the same pivot order as the reference
  `_mzd_ple_naive`, ple.c:223-273, so P/Q are reproduced exactly) using
  branchless masked vector ops over all rows.
- The panel's unit-lower transform L11 is inverted with the nilpotent series
  (log2(NB) small MXU products) instead of sequential substitution, giving
  the panel's U rows in one multiply; the trailing Schur update is a single
  large GF(2) MXU product (ops/mul.py).  This keeps the O(n^3) work on the
  systolic array and leaves only O(n) cheap scalar steps sequential.
- Like the reference, the in-place result preserves L in the pivot columns
  (elimination touches only columns right of the pivot, cf.
  `mzd_row_add_offset(A, l, row, j+1)` in ple.c:245), then `_compress_l`
  moves L columns to the left (reference: ple.c:259-268, mzp.c:294).

Rank deficiency is handled with masks: shapes stay static, the rank is a
traced scalar, and padded rows/columns are zero so they can never pivot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..core.bitmatrix import BitMatrix, mask_padding
from ..ops.mul import mul_packed_data, pack_bits, unpack_bits
from ..utils.config import WORD_BITS, get_config

__all__ = ["ple", "pluq", "block_factor"]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("m", "n", "nb", "preserve_l",
                                             "search_window"))
def _block_factor_impl(data, m: int, n: int, nb: int, preserve_l: bool,
                       search_window: int = 0):
    nbw = nb // WORD_BITS
    m_pad = _round_up(m, nb) + nb
    n_pad = _round_up(n, nb)
    w_pad = n_pad // WORD_BITS
    n_panels = n_pad // nb

    A = jnp.zeros((m_pad, w_pad), jnp.uint32)
    A = A.at[: data.shape[0], : data.shape[1]].set(data)
    P = jnp.arange(m_pad, dtype=jnp.int32)
    # Q gets nb slack so the per-panel dynamic_update at offset r_in can
    # never clamp (r_in <= n_pad)
    Q = jnp.arange(n_pad + nb, dtype=jnp.int32)
    ridx = jnp.arange(m_pad, dtype=jnp.int32)
    eye_nb = jnp.eye(nb, dtype=jnp.int8)
    widx = jnp.arange(w_pad, dtype=jnp.int32)
    jrow = jnp.arange(nb, dtype=jnp.int32)

    valid_rows = ridx < m  # static per shape

    def panel(carry, t):
        A, P, Q, r = carry
        r_in = r
        c0w = t * nbw
        Apanel = lax.dynamic_slice(A, (0, c0w), (m_pad, nbw))
        Lp = jnp.zeros((m_pad, nb), jnp.uint8)
        rowperm = jnp.arange(m_pad, dtype=jnp.int32)
        # records of the swap endpoints, to apply the permutation to the
        # rest of A by touching only the <= 2*nb affected rows
        touched = jnp.zeros((2 * nb,), jnp.int32)
        # per-panel pivot records; scattered into P/Q once at panel end
        p_pan = jnp.zeros((nb,), jnp.int32)
        q_pan = jnp.zeros((nb,), jnp.int32)

        def colstep(j, st):
            # Hot sequential loop: every op here runs n times total, so the
            # body is trimmed to a minimum (single min-reduction pivot
            # search, swap gathers reused, bookkeeping on (nb,) arrays).
            Apanel, Lp, rowperm, r, touched, p_pan, q_pan = st
            wloc = j // WORD_BITS
            sh = jnp.uint32(j % WORD_BITS)
            col = (jnp.take(Apanel, wloc, axis=1) >> sh) & 1
            cand = (col == 1) & (ridx >= r) & valid_rows
            if search_window:
                # restricted pivot search (reference analogue:
                # _mzd_top_echelonize_m4ri searches only r..r+kk,
                # brilliantrussian.c:875)
                cand = cand & (ridx < r + search_window)
            first = jnp.min(jnp.where(cand, ridx, jnp.int32(m_pad)))
            found = first < m_pad
            rs = jnp.minimum(r, m_pad - 1)
            ps = jnp.where(found, first, rs)

            ap_rs, ap_ps = Apanel[rs], Apanel[ps]
            Apanel = Apanel.at[rs].set(ap_ps).at[ps].set(ap_rs)
            lp_rs, lp_ps = Lp[rs], Lp[ps]
            Lp = Lp.at[rs].set(lp_ps).at[ps].set(lp_rs)
            rp_rs, rp_ps = rowperm[rs], rowperm[ps]
            rowperm = rowperm.at[rs].set(rp_ps).at[ps].set(rp_rs)

            touched = lax.dynamic_update_slice(
                touched, jnp.stack([rs, ps]), (2 * j,))
            slot = r - r_in
            p_pan = p_pan.at[slot].set(ps, mode="drop")
            q_pan = q_pan.at[slot].set(t * nb + j, mode="drop")

            pivrow = ap_ps  # the row now sitting at position rs
            if preserve_l:
                # keep columns <= j intact (reference: row_add from col j+1)
                gt = ~(((jnp.uint32(1) << sh) << 1) - 1)  # bits > sh
                wmask = jnp.where(
                    jnp.arange(nbw) > wloc, jnp.uint32(0xFFFFFFFF),
                    jnp.where(jnp.arange(nbw) == wloc, gt, jnp.uint32(0)))
                elim_row = pivrow & wmask
            else:
                elim_row = pivrow
            # post-swap elimination mask from the pre-swap column bits:
            # rows > r keep their bit except position ps which received
            # the old row rs (excluded anyway: col[rs] refers to the pivot
            # slot and rows > r excludes rs <= r)
            elim = col.at[ps].set(col[rs])
            elim = (elim == 1) & (ridx > r) & found
            em = elim.astype(jnp.uint32)
            Apanel = Apanel ^ (em[:, None] * elim_row[None, :])
            Lp = lax.dynamic_update_slice(
                Lp, elim.astype(jnp.uint8)[:, None], (0, slot))
            r = r + found.astype(jnp.int32)
            return (Apanel, Lp, rowperm, r, touched, p_pan, q_pan)

        Apanel, Lp, rowperm, r, touched, p_pan, q_pan = lax.fori_loop(
            0, nb, colstep,
            (Apanel, Lp, rowperm, r, touched, p_pan, q_pan))

        # commit the panel's pivot records into the global swap arrays
        rank_panel_ = r - r_in
        kslot = jnp.arange(nb, dtype=jnp.int32)
        live = kslot < rank_panel_
        p_old = lax.dynamic_slice(P, (r_in,), (nb,))
        q_old = lax.dynamic_slice(Q, (r_in,), (nb,))
        P = lax.dynamic_update_slice(P, jnp.where(live, p_pan, p_old), (r_in,))
        Q = lax.dynamic_update_slice(Q, jnp.where(live, q_pan, q_old), (r_in,))

        # apply the row permutation to the rest of A: only the swap
        # endpoints moved (<= 2*nb rows), so gather/scatter just those
        moved = A[rowperm[touched]]
        A = A.at[touched].set(moved, mode="drop")
        A = lax.dynamic_update_slice(A, Apanel, (0, c0w))

        # --- U rows of this panel via nilpotent inversion of L11 ---
        rank_panel = r - r_in
        l11 = lax.dynamic_slice(Lp, (r_in, 0), (nb, nb)).astype(jnp.int8)
        s = eye_nb ^ l11
        p = l11
        steps = max(0, (nb - 1).bit_length() - 1)
        for _ in range(steps):
            p = (lax.dot_general(p, p, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
                 & 1).astype(jnp.int8)
            s = s ^ (lax.dot_general(p, s, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
                     & 1).astype(jnp.int8)
        a_block = lax.dynamic_slice(A, (r_in, 0), (nb, w_pad))
        au = unpack_bits(a_block, jnp.int8)
        u = (lax.dot_general(s, au, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32) & 1)
        u = u * (jrow < rank_panel)[:, None]
        up = pack_bits(u)
        # only trailing columns take the Schur update
        up = up * (widx >= (t + 1) * nbw)[None, :].astype(jnp.uint32)

        # --- Schur update: A ^= Lp @ U (MXU product) ---
        lp_packed = pack_bits(Lp)
        delta = mul_packed_data(lp_packed, up)
        A = A ^ delta
        return (A, P, Q, r), None

    (A, P, Q, r), _ = lax.scan(
        panel, (A, P, Q, jnp.int32(0)), jnp.arange(n_panels, dtype=jnp.int32))
    return A[:m, : data.shape[1]], P[:m], Q[:n], r


def block_factor(a: BitMatrix, preserve_l: bool, nb: int | None = None,
                 search_window: int = 0):
    """Shared panel factorization.  Returns (data, P, Q, rank) where data is
    the in-place pre-compress layout: rows 0..r-1 are the echelon rows E
    (pivot i at column Q[i]); if preserve_l, the L multipliers are preserved
    in the pivot columns below each pivot (reference pre-compress layout)."""
    if nb is None:
        nb = get_config().panel_width
    nb = max(WORD_BITS, _round_up(min(nb, max(WORD_BITS, a.ncols)), WORD_BITS))
    data, p, q, r = _block_factor_impl(
        a.data, a.nrows, a.ncols, nb, preserve_l, search_window)
    return data, p, q, r


@functools.partial(jax.jit, static_argnames=("m", "n"))
def _compress_l_seq(data, q, r, m: int, n: int):
    """Sequential reference semantics of the L compression (one masked
    column swap per pivot) — kept as the cross-validation sibling of the
    vectorized version below."""
    ridx = jnp.arange(m, dtype=jnp.int32)

    def body(j, data):
        a = q[j]
        b = jnp.int32(j)
        wa, sa = a // WORD_BITS, (a % WORD_BITS).astype(jnp.uint32)
        wb, sb = b // WORD_BITS, (b % WORD_BITS).astype(jnp.uint32)
        bits_a = (data[:, wa] >> sa) & 1
        bits_b = (data[:, wb] >> sb) & 1
        act = ((ridx >= b) & (j < r)).astype(jnp.uint32)
        diff = (bits_a ^ bits_b) * act
        data = data.at[:, wa].set(data[:, wa] ^ (diff << sa))
        data = data.at[:, wb].set(data[:, wb] ^ (diff << sb))
        return data

    return lax.fori_loop(0, min(m, n), body, data)


@functools.partial(jax.jit, static_argnames=("m", "n"))
def _compress_l_impl(data, q, r, m: int, n: int):
    """Move L columns into 0..r-1 (reference: _mzd_ple_naive compression,
    ple.c:259-268 — for j < r ascending: col_swap_in_rows(A, Q[j], j,
    rows j..m)).

    Vectorized: because Q is injective and Q[j] >= j, each column's content
    changes at most twice across the whole ascending swap sequence —
    once in its *source* role (some j with Q[j] = c pulls the then-current
    column j into c, whose origin is resolved by chasing the j <- Q[j'] = j
    chain with pointer doubling) and once in its *target* role (column
    c < r receives the original column Q[c]; Q[c]'s content is provably
    untouched before step c).  The sequential loop therefore collapses into
    two column gathers and masked selects — O(log r) tiny steps instead of
    min(m, n) full passes."""
    import numpy as np
    from ..ops.mul import pack_bits, unpack_bits

    rmax = min(m, n)
    c = jnp.arange(n, dtype=jnp.int32)
    t = jnp.arange(rmax, dtype=jnp.int32)
    qv = q[:rmax]
    real = (t < r) & (qv != t)  # real swaps (Q[j] > j since Q[j] >= j)

    # src_event[c] = the j with Q[j] = c (if any real one exists)
    src_event = jnp.full((n,), jnp.int32(n))
    src_event = src_event.at[jnp.where(real, qv, jnp.int32(n))].set(
        t, mode="drop")
    # chase the chain j <- (j' with Q[j'] = j) to its origin column
    f = jnp.where(src_event[:rmax] < n, src_event[:rmax], t)
    for _ in range(max(1, int(np.ceil(np.log2(max(rmax, 2)))))):
        f = f[f]

    sv = src_event < n  # column is a swap source
    o1 = jnp.where(sv, f[jnp.clip(src_event, 0, rmax - 1)], c)
    tv = jnp.zeros((n,), jnp.bool_).at[:rmax].set(real)  # column is a target
    o2 = jnp.where(tv, jnp.pad(qv, (0, n - rmax)), c)

    bits = unpack_bits(data, jnp.uint8)[:, :n]
    g1 = bits[:, o1]
    g2 = bits[:, o2]
    i = jnp.arange(m, dtype=jnp.int32)[:, None]
    out = jnp.where(tv[None, :] & (i >= c[None, :]), g2,
                    jnp.where(sv[None, :] & (i >= src_event[None, :]), g1,
                              bits))
    packed = pack_bits(out)
    w = data.shape[1]
    if packed.shape[1] < w:
        packed = jnp.pad(packed, ((0, 0), (0, w - packed.shape[1])))
    return packed[:, :w]


def ple(a: BitMatrix, nb: int | None = None):
    """PLE decomposition (reference API: mzd_ple, ple.c:33).

    Returns (M, P, Q, rank): M holds L (unit lower, columns 0..r-1,
    compressed) and S=E in place exactly like the reference; P, Q are
    LAPACK-style swap arrays (mzp_t format)."""
    data, p, q, r = block_factor(a, preserve_l=True, nb=nb)
    data = _compress_l_impl(data, q, r, a.nrows, a.ncols)
    return mask_padding(BitMatrix(data, a.ncols)), p, q, r


def pluq(a: BitMatrix, nb: int | None = None):
    """PLUQ decomposition (reference API: mzd_pluq = _mzd_ple +
    mzd_apply_p_right_trans_tri, ple.c:50-60)."""
    from ..core.permutation import apply_p_right_trans_tri
    m, p, q, r = ple(a, nb=nb)
    m = apply_p_right_trans_tri(m, q)
    return m, p, q, r
