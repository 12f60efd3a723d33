"""Per-stage cost breakdown of the panel factorization at driver size.

Times block_factor with successive stages stubbed out (timing-only — the
results are wrong once a stage is stubbed, but the loop structure, layouts
and remaining stages are untouched), isolating:

    full                = everything
    - schur             = Schur kernel replaced by passthrough
    - schur - upanel    = also skip the per-panel U-row product
    - schur - upanel - post = also stub the fused below-window pass

The deltas attribute the wall time per stage; the residual of the last
variant is the pivot kernel + permutation/glue floor.

Usage: python benches/probe_ple_breakdown.py [n] [nb] [window]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timeit(fn, reps=4):
    # block_factor's impl is a module-level jax.jit: without clearing the
    # trace cache a monkeypatched stage would never be retraced and every
    # variant would re-run the originally compiled program
    jax.clear_caches()
    fn()  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    window = int(sys.argv[3]) if len(sys.argv) > 3 else 512

    from m4ri_tpu.core.bitmatrix import BitMatrix, width_for
    from m4ri_tpu.models import ple as ple_mod
    from m4ri_tpu.ops import pallas_mul, pallas_post, pallas_schur

    a = BitMatrix(jax.random.bits(jax.random.PRNGKey(0), (n, width_for(n)),
                                  dtype=jnp.uint32), n)

    def run():
        d, p, q, r = ple_mod.block_factor(a, preserve_l=True, nb=nb,
                                          window=window)
        return int(jax.device_get(r))

    results = {}
    results["full"] = timeit(run)
    print(f"full: {results['full']:.4f} s", flush=True)

    orig_schur = pallas_schur.gf2_schur_update
    orig_dyn = pallas_schur.gf2_schur_update_dyn
    pallas_schur.gf2_schur_update = (
        lambda c, lp, up, r0, c0w, **kw: c)
    pallas_schur.gf2_schur_update_dyn = (
        lambda c, lp, up, r0, c0w, **kw: c)
    # ple.py imports the symbols inside the panel body, so patching the
    # module attribute is enough; a fresh trace picks it up.
    results["-schur"] = timeit(run)
    print(f"-schur: {results['-schur']:.4f} s", flush=True)

    orig_mul = pallas_mul.gf2_mul_pallas
    pallas_mul.gf2_mul_pallas = (
        lambda a_, b_, **kw: jnp.zeros((a_.shape[0], b_.shape[1]),
                                       jnp.uint32))
    results["-schur-upanel"] = timeit(run)
    print(f"-schur-upanel: {results['-schur-upanel']:.4f} s", flush=True)

    orig_post = pallas_post.panel_post
    def stub_post(Xw, m_small, wmat, cmb, row0, m, **kw):
        return Xw, jnp.zeros_like(Xw), jnp.bool_(False)
    pallas_post.panel_post = stub_post
    results["-schur-upanel-post"] = timeit(run)
    print(f"-schur-upanel-post: {results['-schur-upanel-post']:.4f} s",
          flush=True)

    orig_swaps = ple_mod._apply_row_perm_window
    ple_mod._apply_row_perm_window = lambda A, rpw, r_in: A
    results["-rowswap"] = timeit(run)
    print(f"-rowswap: {results['-rowswap']:.4f} s", flush=True)

    orig_write = ple_mod._write_panel_cols
    ple_mod._write_panel_cols = lambda A, p, c: A
    results["-writepanel"] = timeit(run)
    print(f"-writepanel: {results['-writepanel']:.4f} s", flush=True)

    from m4ri_tpu.ops import pallas_panel
    orig_loop = pallas_panel.panel_loop
    def stub_loop(AL0, r, base, m_, nb=256, preserve_l=True,
                  search_window=0, interpret=False):
        h = AL0.shape[0]
        return (AL0, jnp.arange(h, dtype=jnp.int32), r + nb,
                jnp.zeros((2 * nb,), jnp.int32),
                jnp.zeros((nb,), jnp.int32), jnp.zeros((nb,), jnp.int32))
    pallas_panel.panel_loop = stub_loop
    results["-pivot"] = timeit(run)
    print(f"-pivot: {results['-pivot']:.4f} s", flush=True)

    orig_inv = ple_mod._unit_upper_inv
    ple_mod._unit_upper_inv = lambda nilp, eye, steps: eye ^ nilp
    results["-unitinv"] = timeit(run)
    print(f"-unitinv: {results['-unitinv']:.4f} s", flush=True)
    ple_mod._unit_upper_inv = orig_inv

    pallas_schur.gf2_schur_update = orig_schur
    pallas_schur.gf2_schur_update_dyn = orig_dyn
    pallas_mul.gf2_mul_pallas = orig_mul
    pallas_post.panel_post = orig_post
    ple_mod._apply_row_perm_window = orig_swaps
    ple_mod._write_panel_cols = orig_write
    pallas_panel.panel_loop = orig_loop

    print("\nattribution:")
    print(f"  schur   {results['full'] - results['-schur']:.4f} s")
    print(f"  upanel  {results['-schur'] - results['-schur-upanel']:.4f} s")
    print(f"  post    {results['-schur-upanel'] - results['-schur-upanel-post']:.4f} s")
    print(f"  rowswap {results['-schur-upanel-post'] - results['-rowswap']:.4f} s")
    print(f"  writepn {results['-rowswap'] - results['-writepanel']:.4f} s")
    print(f"  pivot   {results['-writepanel'] - results['-pivot']:.4f} s")
    print(f"  unitinv {results['-pivot'] - results['-unitinv']:.4f} s")
    print(f"  floor   {results['-unitinv']:.4f} s (slices + scan glue)")


if __name__ == "__main__":
    main()
