"""Strassen depth-3 retry with buffer donation at n=65536 (VERDICT r5 #8).

The round-3 depth study recorded depth 3's two-product chain OOMing at
17.4 GB of HLO temporaries; this probe re-runs the depth sweep with the
chain carry DONATED (jax donate_argnums — the analogue of the reference
reusing its Wmk/Wkn windows, strassen.c:85-151) on the round-4b base
kernel (int4 deep-chunk), which moved the depth trade-off's base rate
from 299 to ~715 Tbit-op/s direct.

Usage: python benches/probe_strassen2.py [n] [levels...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    levels_list = [int(x) for x in sys.argv[2:]] or [2, 3]

    import jax
    import jax.numpy as jnp
    from m4ri_tpu.ops.mul import mul_packed_data
    from m4ri_tpu.ops.strassen import strassen_mul_data

    w = n // 32
    a = jax.random.bits(jax.random.PRNGKey(0), (n, w), dtype=jnp.uint32)
    b = jax.random.bits(jax.random.PRNGKey(1), (n, w), dtype=jnp.uint32)
    jax.device_get(a[:1, :1])

    for lv in levels_list:
        if lv == 0:
            core = mul_packed_data
        else:
            core = functools.partial(
                strassen_mul_data, m=n, k=n, n=n,
                cutoff=n >> (lv + 1), max_levels=lv)

        @functools.partial(jax.jit, static_argnames="iters",
                           donate_argnums=(0,))
        def chain(x, b, iters, core=core):
            for _ in range(iters):
                x = core(x, b)
            return x

        try:
            t0 = time.time()
            for iters in (1, 2):
                jax.device_get(chain(jnp.copy(a), b, iters)[:4, :2])
            print(f"# level {lv}: compiled+warmed in {time.time()-t0:.1f}s",
                  flush=True)
            times = {}
            for iters in (1, 2):
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    jax.device_get(chain(jnp.copy(a), b, iters)[:4, :2])
                    best = min(best, time.time() - t0)
                times[iters] = best
            slope = times[2] - times[1]
            tbit = 2.0 * n**3 / slope / 1e12
            print(f"level {lv} (donated): slope {slope:.4f} s -> "
                  f"{tbit:.1f} Tbit-op/s (t1={times[1]:.4f}, "
                  f"t2={times[2]:.4f})", flush=True)
        except Exception as e:
            print(f"level {lv}: FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
