"""Hardware correctness probe for the fully-dynamic Schur kernel
(ops/pallas_schur.gf2_schur_update_dyn) before flipping Config.schur_dyn.

Compares dyn vs the static-instance kernel on real Mosaic for several
(r0, c0w) runtime bounds; interpret-mode bit-identity was already pinned
in tests/test_pallas.py, this checks the actual lowering.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from m4ri_tpu.ops.pallas_schur import gf2_schur_update, gf2_schur_update_dyn


def main():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    m, nw, kw = 1024, 256, 8
    c = jax.random.bits(k1, (m, nw), dtype=jnp.uint32)
    lp = jax.random.bits(k2, (m, kw), dtype=jnp.uint32)
    up = jax.random.bits(k3, (kw * 32, nw), dtype=jnp.uint32)
    for r0, c0w in [(0, 0), (256, 128), (300, 130), (768, 250)]:
        lpm = lp * (jnp.arange(m)[:, None] >= r0).astype(jnp.uint32)
        upm = up * (jnp.arange(nw)[None, :] >= c0w).astype(jnp.uint32)
        ref = gf2_schur_update(c, lpm, upm, r0, c0w, tm=256, tnw=128)
        dyn = gf2_schur_update_dyn(c, lpm, upm, r0, c0w, tm=256, tnw=128)
        ok = bool(jnp.all(jax.device_get(ref) == jax.device_get(dyn)))
        print("r0", r0, "c0w", c0w, "ok", ok)
        assert ok, f"dyn-Schur mismatch at r0={r0} c0w={c0w}"
    print("DYN PROBE OK")


if __name__ == "__main__":
    main()
