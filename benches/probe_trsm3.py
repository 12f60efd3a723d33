"""TRSM retune probe (VERDICT r5 #3): wide-B strategy study at driver size.

The shipped trsm_* routes wide B (b.ncols*4 >= n) to TRTRI + one dense
product: ~2.67*n^3 MXU bit-ops (trtri recursion ~0.67 n^3 + final 2 n^3).
Block substitution with a square B costs ~n^3/2^k per level and a base
TRTRI+mul of 2 n^3 / 2^d — arithmetically ~2x less at depth 2-3.  This
probe measures, at n (default 32768), upper-left square-B TRSM:

  A. shipped path (gate as-is: TRTRI + mul)
  B. substitution to base nb in {8192, 4096, 2048}, TRTRI+mul at base
  C. trtri alone + mul alone (stage split of A)

Usage: python benches/probe_trsm3.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from m4ri_tpu.core.bitmatrix import (BitMatrix, identity, mask_padding,
                                     submatrix, width_for)
from m4ri_tpu.core.bitops import _triangle_mask
from m4ri_tpu.models import triangular as tri
from m4ri_tpu.ops.mul import mul


def bench(tag, fn, *args, reps=3):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0][0, :4])
        ts.append(time.perf_counter() - t0)
    print(f"{tag}: {min(ts):.4f} s", flush=True)
    return out


def subst_upper_left(t: BitMatrix, b: BitMatrix, base: int) -> BitMatrix:
    """Substitution regardless of B width, down to `base`, then
    TRTRI+mul.  Mirrors _trsm_left_rec's upper branch."""
    n = t.ncols
    if n <= base:
        return mul(tri._trtri(t, True), b)
    n1 = tri._split(n)
    a = submatrix(t, 0, 0, n1, n1)
    d = submatrix(t, n1, n1, n, n)
    b_top = submatrix(b, 0, 0, n1, b.ncols)
    b_bot = submatrix(b, n1, 0, b.nrows, b.ncols)
    x2 = subst_upper_left(d, b_bot, base)
    off = submatrix(t, 0, n1, n1, n)
    r1 = BitMatrix(b_top.data ^ mul(off, x2).data, b.ncols)
    x1 = subst_upper_left(a, r1, base)
    return mask_padding(BitMatrix(
        jnp.concatenate([x1.data, x2.data], axis=0), b.ncols))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    tdata = jax.random.bits(jax.random.PRNGKey(0), (n, width_for(n)),
                            dtype=jnp.uint32)
    keep = _triangle_mask(n, upper=True)
    t = mask_padding(BitMatrix((tdata & keep) | identity(n).data, n))
    b = mask_padding(BitMatrix(
        jax.random.bits(jax.random.PRNGKey(1), (n, width_for(n)),
                        dtype=jnp.uint32), n))

    ref = bench("A shipped (trtri+mul)",
                lambda t_, b_: tri._trsm_left_rec(t_, b_, True), t, b)

    ti = bench("C1 trtri alone       ",
               lambda t_: tri._trtri(t_, True), t)
    bench("C2 final mul alone   ", mul, ti, b)

    for base in (8192, 4096, 2048):
        got = bench(f"B subst base={base:5d}  ",
                    lambda t_, b_, bs=base: subst_upper_left(t_, b_, bs),
                    t, b)
        ok = bool(jnp.all(got.data[:512] == ref.data[:512]))
        print(f"   match(first 512 rows): {ok}", flush=True)


if __name__ == "__main__":
    main()
