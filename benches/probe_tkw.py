"""Chunk-depth (tkw) sweep for the v2 fused mul kernel.

Deeper chunks cut parity-pack count and C read-modify-write traffic
(both scale with KB = kw/tkw); the B VMEM cache bounds tk.  Validates
each config bit-exact against the shipped default before timing.

Usage: python benches/probe_tkw.py [n ...]   (default 4096 8192 16384)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


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
    sizes = [int(v) for v in sys.argv[1:]] or [4096, 8192, 16384]
    from m4ri_tpu.ops.pallas_mul2 import gf2_mul_pallas_v2

    for n in sizes:
        w = n // 32
        per = 2.0 * n**3
        a = jax.random.bits(jax.random.PRNGKey(0), (n, w), dtype=jnp.uint32)
        b = jax.random.bits(jax.random.PRNGKey(1), (n, w), dtype=jnp.uint32)
        lo, hi = (2, 10) if n <= 8192 else (2, 8)
        ref = None

        for tkw in (32, 64, 128, 256):
            if tkw > w:
                continue

            @functools.partial(jax.jit, static_argnames="iters")
            def chain(a, b, iters, tkw=tkw):
                x = a
                for _ in range(iters):
                    x = gf2_mul_pallas_v2(x, b, op_dtype="int4", tkw=tkw)
                return x

            try:
                got = np.asarray(chain(a, b, 1))
                if ref is None:
                    ref = got
                else:
                    assert np.array_equal(ref, got), f"tkw={tkw} MISMATCH"
                s = timed_slope(
                    lambda it: jax.device_get(chain(a, b, it)[:8]), lo, hi)
                print(f"n={n} tkw={tkw:3d} int4   {s*1e3:9.3f} ms/product  "
                      f"{per/s/1e12:7.1f} Tbit-op/s", flush=True)
            except Exception as e:
                print(f"n={n} tkw={tkw:3d} FAILED: {type(e).__name__} "
                      f"{str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
