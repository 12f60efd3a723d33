"""Probe: does the v5e MXU run int4 x int4 -> int32 dot_general at 2x the
int8 rate?  GF(2) operands are 0/1, so int4 is exact (accumulator int32,
k <= 2^31).  If this runs ~2x, the entire mul roofline doubles (394 ->
~790 effective Tbit-op/s) and the unpack changes dtype only.

Also probes bool/int8 mixed variants and u8 dot for completeness.

Usage: python benches/probe_int4.py [n]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timed_slope(run, lo, hi, reps=5):
    def t(iters):
        t0 = time.perf_counter()
        run(iters)
        return time.perf_counter() - t0
    run(lo), run(hi)
    slopes = []
    for _ in range(reps):
        a = min(t(lo) for _ in range(3))
        b = min(t(hi) for _ in range(3))
        slopes.append((b - a) / (hi - lo))
    slopes.sort()
    return slopes[len(slopes) // 2]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    per = 2.0 * n**3
    key = jax.random.PRNGKey(0)
    bits_a = jax.random.bernoulli(key, 0.5, (n, n))
    bits_b = jax.random.bernoulli(jax.random.PRNGKey(1), 0.5, (n, n))
    lo, hi = 2, 12

    a8 = bits_a.astype(jnp.int8)
    b8 = bits_b.astype(jnp.int8)

    def bench(dt, name):
        # cast INSIDE the jit: a top-level astype to int4 trips a
        # "recursively calling jit" in the axon remote backend
        @functools.partial(jax.jit, static_argnames="iters")
        def chain(a, b, iters):
            x = a.astype(dt)
            bb = b.astype(dt)
            for _ in range(iters):
                p = jax.lax.dot_general(
                    x, bb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                x = (p & 1).astype(dt)  # keep 0/1, serial dependence
            return p

        try:
            s = timed_slope(
                lambda it: jax.device_get(chain(a8, b8, it)[:8, :8]), lo, hi)
            print(f"{name:12s} {s*1e3:9.3f} ms/product  "
                  f"{per/s/1e12:7.1f} Top/s", flush=True)
        except Exception as e:
            print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    bench(jnp.int8, "int8")
    try:
        bench(jnp.int4, "int4")
    except Exception as e:
        print("int4 unavailable:", e)
    bench(jnp.bfloat16, "bf16")

    # correctness spot-check for int4 if it ran (casts inside one jit)
    try:
        @jax.jit
        def check(a, b):
            sa, sb = a[:256, :512], b[:512, :256]
            p4 = jax.lax.dot_general(
                sa.astype(jnp.int4), sb.astype(jnp.int4),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            p8 = jax.lax.dot_general(
                sa, sb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return jnp.all(p4 == p8)
        print("int4 exact vs int8:", bool(jax.device_get(check(a8, b8))))
    except Exception as e:
        print("int4 correctness probe failed:", type(e).__name__,
              str(e)[:160])


if __name__ == "__main__":
    main()
