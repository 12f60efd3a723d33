"""Hardware-derived tuning configuration.

The reference library derives every algorithmic cutoff from CPU cache sizes
detected at configure time (reference: m4ri_config.h.in, misc.h:569-599,
strassen.h:133-135, ple.h:40).  The TPU build derives the analogous knobs from
the JAX device at import time: VMEM-resident tile sizes, MXU-aligned block
sizes, and Strassen/PLE crossover points.

All sizes are in *bits* (matrix dimensions) unless noted.
"""

from __future__ import annotations

import dataclasses
import functools

WORD_BITS = 32  # TPU vector lanes are 32-bit; reference uses 64 (misc.h:87).


@dataclasses.dataclass(frozen=True)
class Config:
    # Panel width for blocked PLE / echelonization (reference analogue:
    # kk = 6*k Gray-code round width, brilliantrussian.c:642-647).
    panel_width: int = 128
    # Block size for the MXU matmul k-dimension when the operands are too
    # large to unpack at once (reference analogue: __M4RI_MUL_BLOCKSIZE,
    # mzd.h:59 — babystep/giantstep blocking to keep tables L2 resident).
    mul_block_k: int = 8192
    # Row-block size bounding the int32 product intermediate in HBM.
    mul_block_m: int = 8192
    # Below this dimension, use one fused matmul with no blocking.
    mul_block_threshold: int = 8192
    # Strassen-Winograd crossover (reference: __M4RI_STRASSEN_MUL_CUTOFF =
    # MIN(sqrt(4*L3), 4096), strassen.h:133-135).  On the MXU the base
    # multiply is so fast that Strassen only pays off for large n.
    strassen_cutoff: int = 8192
    # dtype used for the unpacked MXU operands: "int8" (2x rate on v5e) or
    # "bfloat16" (exact for k <= 2**24 with f32 accumulation).
    mxu_dtype: str = "int8"
    # Density crossover at which M4RI echelonization switches to PLUQ
    # (reference: echelonform.h:37, threshold 0.15).
    echelon_density_crossover: float = 0.15
    # Route shallow-k products (k <= 1024, large m/n) through the fused
    # Pallas kernel on TPU (avoids the HBM int32-product materialization).
    use_pallas_schur: bool = True
    # Route large deep products through the fused Pallas kernel on TPU
    # (measured: 375 vs 353 Tbit-op/s vs blocked XLA at n=16384, and no
    # unpacked-operand HBM materialization).
    use_pallas_big: bool = True
    # Strassen recursion depth cap (compile size grows 7^levels).
    strassen_max_levels: int = 2


@functools.lru_cache(maxsize=1)
def get_config() -> Config:
    return Config()
