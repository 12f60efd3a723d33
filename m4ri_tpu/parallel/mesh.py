"""Device mesh utilities.

The reference's only parallelism is OpenMP shared memory (mp.c 2x2 sections,
`omp parallel for` over rows — SURVEY §2 #19).  The TPU-native replacement is
SPMD over a jax.sharding.Mesh: matrices are sharded by row blocks and word
(column) blocks, and XLA collectives move panels over ICI.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "xor_allgather_reduce"]


def make_mesh(n_devices: int | None = None, axis_names=("x", "y")) -> Mesh:
    """A 2-D mesh as square as possible over the available devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    rx = int(math.sqrt(n))
    while n % rx:
        rx -= 1
    return Mesh(np.array(devices).reshape(rx, n // rx), axis_names)


def xor_allgather_reduce(x, axis_name: str):
    """XOR all-reduce along a mesh axis.

    psum cannot be used directly (XOR != addition), so we all-gather the
    partial parities and fold locally — the partials are packed words, so
    the gather moves exactly the data a ring XOR-reduce would.
    """
    import jax.numpy as jnp
    gathered = jax.lax.all_gather(x, axis_name)  # (axis_size, ...)
    return jax.lax.reduce(gathered, jnp.uint32(0), jax.lax.bitwise_xor, (0,))
