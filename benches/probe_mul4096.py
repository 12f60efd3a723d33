"""Deep-dive on the n=4096 sustained-throughput gap (VERDICT r2 #6:
sustained 273 vs 380+ at n>=16384; target >= 340).

Chain-times (slope protocol, see BASELINE.md) every plausible engine at
n=4096 so the dispatch default is set from sustained numbers, not
single-shot probes:
  - fused Pallas kernel over a (tm, tnw) tile sweep
  - XLA single fused dot (unpack -> int8 dot -> parity -> pack)
  - production mul() dispatch as shipped

Usage: python benches/probe_mul4096.py [n]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    w = n // 32
    per = 2.0 * n**3
    a = jax.random.bits(jax.random.PRNGKey(0), (n, w), dtype=jnp.uint32)
    b = jax.random.bits(jax.random.PRNGKey(1), (n, w), dtype=jnp.uint32)
    lo, hi = 4, 44

    def report(name, s):
        print(f"{name:28s} {s*1e3:8.3f} ms/product   "
              f"{per/s/1e12:7.1f} Tbit-op/s", flush=True)

    # 1. production dispatch
    from m4ri_tpu.core.bitmatrix import BitMatrix
    from m4ri_tpu.ops.mul import mul, mul_packed_data

    @functools.partial(jax.jit, static_argnames="iters")
    def chain_mul(a, b, iters):
        B = BitMatrix(b, n)
        x = a
        for _ in range(iters):
            x = mul(BitMatrix(x, n), B).data
        return x

    report("dispatch (shipped)",
           timed_slope(lambda it: jax.device_get(chain_mul(a, b, it)[:8]),
                       lo, hi))

    # 2. XLA single fused dot
    from m4ri_tpu.utils.config import Config

    cfg_xla = Config(use_pallas_big=False, use_pallas_schur=False,
                     mul_block_threshold=65536)

    @functools.partial(jax.jit, static_argnames="iters")
    def chain_xla(a, b, iters):
        x = a
        for _ in range(iters):
            x = mul_packed_data(x, b, cfg=cfg_xla, allow_pallas=False)
        return x

    try:
        report("xla fused dot",
               timed_slope(lambda it: jax.device_get(chain_xla(a, b, it)[:8]),
                           lo, hi))
    except Exception as e:
        print("xla fused dot FAILED:", type(e).__name__, str(e)[:200])

    # 3. Pallas tile sweep
    from m4ri_tpu.ops.pallas_mul import gf2_mul_pallas

    for tm, tnw in [(256, 128), (512, 128), (128, 128), (1024, 128),
                    (256, 256), (512, 256)]:
        @functools.partial(jax.jit, static_argnames=("iters", "tm", "tnw"))
        def chain_pl(a, b, iters, tm=tm, tnw=tnw):
            x = a
            for _ in range(iters):
                x = gf2_mul_pallas(x, b, tm=tm, tnw=tnw)
            return x
        try:
            report(f"pallas tm={tm} tnw={tnw}",
                   timed_slope(
                       lambda it: jax.device_get(chain_pl(a, b, it)[:8]),
                       lo, hi))
        except Exception as e:
            print(f"pallas tm={tm} tnw={tnw} FAILED:",
                  type(e).__name__, str(e)[:160])


if __name__ == "__main__":
    main()
