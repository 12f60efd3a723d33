"""Panel-factorization tuning study: times block_factor across
(panel_width nb, window W) variants on the current backend.

Usage: python benches/tune_panel.py [n] [preserve_l(0/1)] [nb:W ...]
e.g.   python benches/tune_panel.py 16384 0 128:512 128:256 256:512
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    preserve_l = bool(int(sys.argv[2])) if len(sys.argv) > 2 else False
    variants = [tuple(map(int, v.split(":"))) for v in sys.argv[3:]] or [
        (128, 512), (128, 256), (128, 128), (256, 512), (256, 256)]

    import jax
    import jax.numpy as jnp
    from m4ri_tpu.core.bitmatrix import BitMatrix, width_for
    from m4ri_tpu.models.ple import block_factor

    a = BitMatrix(jax.random.bits(jax.random.PRNGKey(0), (n, width_for(n)),
                                  dtype=jnp.uint32), n)

    for nb, w in variants:
        t0 = time.perf_counter()

        def once():
            _, _, _, r = block_factor(a, preserve_l=preserve_l, nb=nb,
                                      window=w)
            return int(jax.device_get(r))

        r = once()  # compile + warm
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            once()
            times.append(time.perf_counter() - t0)
        print(f"nb={nb} W={w}: best {min(times):.4f} s "
              f"(mean {sum(times)/len(times):.4f}, compile {compile_s:.0f} s, "
              f"rank {r})", flush=True)


if __name__ == "__main__":
    main()
