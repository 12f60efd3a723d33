"""Micro-op benchmarks (reference: bench/bench_mzd.c — a function mapper
over row ops, transpose, etc.).

Usage: python benches/bench_mzd.py [op] [n]
  op in {transpose, add, randomize, m4rm_tables, col_swap}
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

from harness import emit, run_marginal


def main():
    op = sys.argv[1] if len(sys.argv) > 1 else "transpose"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8192

    import jax
    import jax.numpy as jnp
    from m4ri_tpu.core.bitmatrix import BitMatrix, col_swap, width_for
    from m4ri_tpu.core.transpose import transpose

    w = width_for(n)
    a = jax.random.bits(jax.random.PRNGKey(0), (n, w), dtype=jnp.uint32)
    b = jax.random.bits(jax.random.PRNGKey(1), (n, w), dtype=jnp.uint32)

    if op == "transpose":
        core = lambda x: transpose(BitMatrix(x, n)).data
    elif op == "add":
        core = lambda x: x ^ b
    elif op == "col_swap":
        core = lambda x: col_swap(BitMatrix(x, n), 1, n - 2).data
    else:
        raise SystemExit(f"unknown op {op}")

    @functools.partial(jax.jit, static_argnames="iters")
    def chain(x, iters):
        for _ in range(iters):
            x = core(x)
        return x

    slope = run_marginal(lambda it: jax.device_get(chain(a, it)[:8]), 2, 22)
    gbps = n * w * 4 / slope / 1e9
    emit(f"mzd_{op}_{n}", slope * 1e6, "us", slope)
    print(f"# effective {gbps:.1f} GB/s touched", file=sys.stderr)


if __name__ == "__main__":
    main()
