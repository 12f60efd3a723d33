"""Measure Strassen recursion depth at large n on the real chip.

VERDICT round-1 item 5 asks for a measured call on whether level 3 beats
the round-1 north-star 1.46 s at n=65536 (reference analogue: the cutoff
study bench_multiplication.c runs with an explicit `cutoff` argument).

Usage: python benches/probe_strassen.py [n] [levels...]
"""

import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    levels_list = [int(x) for x in sys.argv[2:]] or [0, 1, 2, 3]

    import jax
    import jax.numpy as jnp
    from m4ri_tpu.ops.mul import mul_packed_data
    from m4ri_tpu.ops.strassen import strassen_mul_data

    w = n // 32
    a = jax.random.bits(jax.random.PRNGKey(0), (n, w), dtype=jnp.uint32)
    b = jax.random.bits(jax.random.PRNGKey(1), (n, w), dtype=jnp.uint32)
    jax.device_get(a[:1, :1])  # materialize inputs

    for lv in levels_list:
        if lv == 0:
            core = mul_packed_data
        else:
            core = functools.partial(
                strassen_mul_data, m=n, k=n, n=n,
                cutoff=n >> (lv + 1), max_levels=lv)

        @functools.partial(jax.jit, static_argnames="iters")
        def chain(a, b, iters, core=core):
            x = a
            for _ in range(iters):
                x = core(x, b)
            return x

        try:
            t0 = time.time()
            for iters in (1, 2):  # warm both chain lengths (compile)
                jax.device_get(chain(a, b, iters)[:4, :2])
            print(f"# level {lv}: compiled+warmed in {time.time()-t0:.1f}s",
                  flush=True)
            times = {}
            for iters in (1, 2):
                best = float("inf")
                for _ in range(2):
                    t0 = time.time()
                    jax.device_get(chain(a, b, iters)[:4, :2])
                    best = min(best, time.time() - t0)
                times[iters] = best
            slope = times[2] - times[1]
            tbit = 2.0 * n**3 / slope / 1e12
            print(f"level {lv}: slope {slope:.4f} s  ->  {tbit:.1f} Tbit-op/s "
                  f"(t1={times[1]:.4f}, t2={times[2]:.4f})", flush=True)
        except Exception as e:  # OOM or compile failure is a data point too
            print(f"level {lv}: FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
