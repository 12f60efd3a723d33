"""Dump the optimized TPU HLO of block_factor and count the big ops in the
panel while-body (full-A copies, dynamic-update-slices, fusions).

AOT-compiles locally against the bundled libtpu (no chip needed) — see
CLAUDE.md / memory:axon-tpu-quirks for the recipe.

Usage: TPU_LIBRARY_PATH=.../libtpu.so python benches/probe_hlo_ple.py [n]
"""

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.experimental import topologies
from jax.sharding import SingleDeviceSharding


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    w = n // 32

    topo = topologies.get_topology_desc(topology_name="v5e:2x2x1",
                                        platform="tpu")
    sd = SingleDeviceSharding(topo.devices[0])

    from m4ri_tpu.models import ple as ple_mod
    from m4ri_tpu.utils.config import get_config

    cfg = get_config()
    kw = dict(m=n, n=n, nb=cfg.panel_width, preserve_l=True,
              search_window=0, window=cfg.panel_window, engine="pallas",
              use_post=True, col_skip=cfg.schur_col_skip,
              dyn_skip=bool(cfg.schur_dyn), op_dtype=cfg.schur_op_dtype,
              agg=1)
    print("config:", kw)

    fn = jax.jit(
        lambda d: ple_mod._block_factor_impl.__wrapped__(d, **kw),
        in_shardings=(sd,), out_shardings=None)
    aval = jax.ShapeDtypeStruct((n, w), jnp.uint32)
    compiled = fn.trace(aval).lower().compile()
    txt = compiled.as_text()
    out = f"/tmp/ple_hlo_{n}.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {out} ({len(txt)} bytes)")

    # find the while body and count ops touching full-A-sized arrays
    m_pad_min = n  # anything with >= n rows and full width counts as "big"
    big = re.compile(r"u32\[(\d+),(\d+)\]")
    ops = Counter()
    bytes_per_op = Counter()
    for line in txt.splitlines():
        ms = big.findall(line)
        if not ms:
            continue
        rows, cols = max(((int(a), int(b)) for a, b in ms),
                         key=lambda t: t[0] * t[1])
        if rows >= m_pad_min and cols >= w:
            opm = re.search(r"= \S+ (\S+)\(", line)
            name = line.strip().split(" = ")[0]
            kind = (re.search(r"= (?:\S+ )?([a-z\-]+)", line.split("=", 1)[1])
                    or [None, "?"])[1]
            ops[kind] += 1
            bytes_per_op[kind] += rows * cols * 4
    print("\nfull-A-sized ops in the module (count / GB touched):")
    for k, v in ops.most_common(20):
        print(f"  {k:30s} {v:4d}   {bytes_per_op[k] / 1e9:8.2f} GB")


if __name__ == "__main__":
    main()
