"""Micro-cost of the per-panel glue ops in the PLE scan body.

Times each glue op in an n_panels-step lax.scan chain (same regime as
block_factor: sequential dependency through A) and reports per-step cost:

    noop        scan carrying A untouched (scan + jit floor)
    sliceXw     dynamic_slice (m_pad, nbw) at a traced lane offset
    dus_panel   dynamic_update_slice of an (m_pad, nbw) panel back in
    rowswap     gather 2*nb rows + scatter them back (the swap commit)
    winslice    dynamic_slice of the (W, nbw) window at a traced row base
    pq_commit   P/Q dynamic slice + where + update (2 int32 vectors)

Usage: python benches/probe_glue.py [n] [nb] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

WORD_BITS = 32


def chain(n_panels, body, a0, aux):
    def step(carry, t):
        return body(carry, t, *aux), None

    out, _ = lax.scan(step, a0, jnp.arange(n_panels, dtype=jnp.int32))
    return out


def timeit(fn, reps):
    r = fn()
    jax.block_until_ready(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(fn()[:4, :4])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    nbw = nb // WORD_BITS
    W = 512
    m_pad = n + nb
    w_pad = n // WORD_BITS
    n_panels = n // nb

    key = jax.random.PRNGKey(0)
    A0 = jax.random.bits(key, (m_pad, w_pad), dtype=jnp.uint32)
    P0 = jnp.arange(m_pad, dtype=jnp.int32)

    def noop(A, t):
        return A ^ jnp.uint32(t)

    def sliceXw(A, t):
        Xw = lax.dynamic_slice(A, (0, t * nbw), (m_pad, nbw))
        return A ^ Xw[0, 0]

    def dus_panel(A, t):
        Xw = lax.dynamic_slice(A, (0, t * nbw), (m_pad, nbw))
        return lax.dynamic_update_slice(A, Xw ^ jnp.uint32(1), (0, t * nbw))

    def rowswap(A, t):
        base = t * nb
        srcp = base + jnp.arange(2 * nb, dtype=jnp.int32)[::-1]
        dstp = base + jnp.arange(2 * nb, dtype=jnp.int32)
        moved = A[srcp]
        return A.at[dstp].set(moved, mode="drop")

    def winslice(A, t):
        win = lax.dynamic_slice(A, (t * nb, 0), (W, nbw))
        return A ^ win[0, 0]

    variants = [("noop", noop), ("sliceXw", sliceXw),
                ("dus_panel", dus_panel), ("rowswap", rowswap),
                ("winslice", winslice)]
    base = None
    for name, body in variants:
        f = jax.jit(lambda A, body=body: chain(n_panels, lambda c, t: body(c, t), A, ()))
        t = timeit(lambda: f(A0), reps)
        extra = "" if base is None else f"  (+{(t - base) / n_panels * 1e6:.1f} us/panel)"
        if base is None:
            base = t
        print(f"{name:10s} {t:.4f} s{extra}", flush=True)


if __name__ == "__main__":
    main()
