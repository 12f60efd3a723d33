"""Driver-grade tkw adjudication at 4096 (long chains, 11 medians).

probe_tkw's short chains (2,10) put the slope inside the tunnel's RPC
jitter at 4096 (~0.1 ms/product vs +-5 ms RTT noise) and round-5 runs
of it returned physically impossible numbers (1445 Tbit-op/s > the int4
roofline).  This probe uses the driver protocol: chains of 4 and 44
products through gf2_mul_pallas_v2 at a fixed tkw, min-of-3 per length,
median of 11 slopes.

Usage: python benches/probe_tkw2.py [n] [tkw ...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    tkws = [int(v) for v in sys.argv[2:]] or [32, 64, 128]
    from m4ri_tpu.ops.pallas_mul2 import gf2_mul_pallas_v2

    w = n // 32
    a = jax.random.bits(jax.random.PRNGKey(0), (n, w), dtype=jnp.uint32)
    b = jax.random.bits(jax.random.PRNGKey(1), (n, w), dtype=jnp.uint32)
    lo, hi = 4, 44

    for tkw in tkws:
        if tkw > w:
            continue

        @functools.partial(jax.jit, static_argnames="iters")
        def chain(a, b, iters, tkw=tkw):
            x = a
            for _ in range(iters):
                x = gf2_mul_pallas_v2(x, b, op_dtype="int4", tkw=tkw)
            return x

        def run(iters):
            return jax.device_get(chain(a, b, iters)[:8])

        run(lo), run(hi)

        def t(iters):
            t0 = time.perf_counter()
            run(iters)
            return time.perf_counter() - t0

        slopes = []
        for _ in range(11):
            x = min(t(lo) for _ in range(3))
            y = min(t(hi) for _ in range(3))
            slopes.append((y - x) / (hi - lo))
        s = float(np.median(slopes))
        print(f"n={n} tkw={tkw:4d}: {s*1e3:.4f} ms/product  "
              f"{2.0*n**3/s/1e12:.1f} Tbit-op/s", flush=True)


if __name__ == "__main__":
    main()
