"""Probe: isolate the sequential pivot-loop cost from the panel batch work.

Times (a) a trivial fori_loop, (b) the exact colstep body, for n total
steps on one resident window — the pure sequential-loop component of the
panel factorization.

Usage: python benches/probe_loop.py [n] [W] [nb]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    nb = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    import jax
    import jax.numpy as jnp
    from jax import lax

    nbw = nb // 32
    key = jax.random.PRNGKey(0)
    AL0 = jax.random.bits(key, (W, 2 * nbw), dtype=jnp.uint32)

    @jax.jit
    def trivial(al):
        def body(j, st):
            return st ^ jnp.uint32(j)
        return lax.fori_loop(0, n, body, al)

    @jax.jit
    def colsteps(al):
        idx = jnp.arange(W, dtype=jnp.int32)
        lane = jnp.arange(2 * nbw, dtype=jnp.int32)
        panel_lane = lane < nbw

        def body(jj, st):
            AL, rowperm, r, touched, p_pan, q_pan = st
            j = jj % nb
            wloc = j // 32
            sh = (j % 32).astype(jnp.uint32)
            col = (jnp.take(AL, wloc, axis=1) >> sh) & 1
            pos = idx
            cand = (col == 1) & (pos >= r) & (pos < W)
            first = jnp.min(jnp.where(cand, idx, jnp.int32(W)))
            found = first < W
            rs = jnp.minimum(r % W, W - 1)
            ps = jnp.where(found, first, rs)
            al_rs, al_ps = AL[rs], AL[ps]
            AL = AL.at[rs].set(al_ps).at[ps].set(al_rs)
            rp_rs, rp_ps = rowperm[rs], rowperm[ps]
            rowperm = rowperm.at[rs].set(rp_ps).at[ps].set(rp_rs)
            touched = lax.dynamic_update_slice(
                touched, jnp.stack([rs, ps]), (2 * j,))
            slot = r % nb
            p_pan = p_pan.at[slot].set(ps, mode="drop")
            q_pan = q_pan.at[slot].set(j, mode="drop")
            gt = ~(((jnp.uint32(1) << sh) << 1) - 1)
            wmask = jnp.where(lane > wloc, jnp.uint32(0xFFFFFFFF),
                              jnp.where(lane == wloc, gt, jnp.uint32(0)))
            wmask = jnp.where(panel_lane, wmask, jnp.uint32(0))
            lbit = jnp.where(lane == nbw + slot // 32,
                             jnp.uint32(1) << (slot % 32).astype(jnp.uint32),
                             jnp.uint32(0))
            elim_row = (al_ps & wmask) | lbit
            elim = col.at[ps].set(col[rs])
            elim = (elim == 1) & (pos > r) & found
            em = elim.astype(jnp.uint32)
            AL = AL ^ (em[:, None] * elim_row[None, :])
            r = (r + found.astype(jnp.int32)) % jnp.int32(W)
            return (AL, rowperm, r, touched, p_pan, q_pan)

        st = (al, jnp.arange(W, dtype=jnp.int32), jnp.int32(0),
              jnp.zeros((2 * nb,), jnp.int32), jnp.zeros((nb,), jnp.int32),
              jnp.zeros((nb,), jnp.int32))
        return lax.fori_loop(0, n, body, st)[0]

    for name, fn in [("trivial", trivial), ("colstep", colsteps)]:
        t0 = time.perf_counter()
        jax.device_get(fn(AL0)[:4])
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            jax.device_get(fn(AL0)[:4])
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"{name}: best {best:.4f} s total, {best / n * 1e6:.2f} us/step"
              f" (compile {compile_s:.0f} s)", flush=True)


if __name__ == "__main__":
    main()
