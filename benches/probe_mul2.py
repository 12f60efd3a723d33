"""Chain-slope comparison of the v1 and v2 fused mul kernels.

Usage: python benches/probe_mul2.py [n ...]   (default 4096 8192 16384)
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
    sizes = [int(v) for v in sys.argv[1:]] or [4096, 8192, 16384]
    from m4ri_tpu.ops.pallas_mul import gf2_mul_pallas
    from m4ri_tpu.ops.pallas_mul2 import gf2_mul_pallas_v2

    for n in sizes:
        w = n // 32
        per = 2.0 * n**3
        a = jax.random.bits(jax.random.PRNGKey(0), (n, w), dtype=jnp.uint32)
        b = jax.random.bits(jax.random.PRNGKey(1), (n, w), dtype=jnp.uint32)
        lo, hi = (4, 44) if n <= 8192 else (2, 8)

        def report(name, engine, **kw):
            @functools.partial(jax.jit, static_argnames="iters")
            def chain(a, b, iters):
                x = a
                for _ in range(iters):
                    x = engine(x, b, **kw)
                return x
            try:
                s = timed_slope(
                    lambda it: jax.device_get(chain(a, b, it)[:8]), lo, hi)
                print(f"n={n} {name:22s} {s*1e3:9.3f} ms/product  "
                      f"{per/s/1e12:7.1f} Tbit-op/s", flush=True)
            except Exception as e:
                print(f"n={n} {name:22s} FAILED: {type(e).__name__} "
                      f"{str(e)[:140]}", flush=True)

        # correctness on hardware first (vs the battle-tested v1-int8)
        c1 = gf2_mul_pallas(a[:512], b)
        for name, engine, kw in [
                ("v2 int8", gf2_mul_pallas_v2, {}),
                ("v1 int4", gf2_mul_pallas, {"op_dtype": "int4"}),
                ("v2 int4", gf2_mul_pallas_v2, {"op_dtype": "int4"})]:
            try:
                c2 = engine(a[:512], b, **kw)
                print(f"n={n} {name} == v1-int8 on chip: "
                      f"{bool(jnp.all(c1 == c2))}", flush=True)
            except Exception as e:
                print(f"n={n} {name} check FAILED: {type(e).__name__} "
                      f"{str(e)[:200]}", flush=True)

        report("v1 (256,128) int8", gf2_mul_pallas, tm=256, tnw=128)
        report("v1 (256,128) int4", gf2_mul_pallas, tm=256, tnw=128,
               op_dtype="int4")
        report("v2 (256,128) int8", gf2_mul_pallas_v2, tm=256, tnw=128)
        report("v2 (256,128) int4", gf2_mul_pallas_v2, tm=256, tnw=128,
               op_dtype="int4")
        report("v2 (512,128) int4", gf2_mul_pallas_v2, tm=512, tnw=128,
               op_dtype="int4")
        report("v2 (512,128) int8", gf2_mul_pallas_v2, tm=512, tnw=128)
        report("v2 (128,128) int8", gf2_mul_pallas_v2, tm=128, tnw=128)


if __name__ == "__main__":
    main()
