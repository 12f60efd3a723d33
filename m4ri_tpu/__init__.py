"""m4ri_tpu — a TPU-native dense linear-algebra engine over GF(2).

A from-scratch rebuild of the capabilities of M4RI (the reference C library)
designed for TPU hardware: bit-packed matrices as uint32 word arrays in HBM,
GF(2) products on the MXU systolic array (int8 multiply + parity), blocked
PLE/PLUQ/echelon factorizations whose Schur updates are MXU matmuls, and
SPMD scaling over a jax.sharding.Mesh.
"""

from .core.bitmatrix import (  # noqa: F401
    BitMatrix, zeros, identity, from_numpy, to_numpy, from_packed,
    randomize, randomize_reference, add, equal, is_zero, read_bit,
    write_bit, submatrix, stack, concat, row_swap, col_swap, density,
)
from .core.transpose import transpose  # noqa: F401
from .ops.mul import mul, addmul, mul_naive  # noqa: F401

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy imports for the higher layers to keep import time low.
    if name in ("ple", "pluq", "block_factor"):
        from .models import ple as _m
        return getattr(_m, name)
    if name in ("echelonize", "echelonize_pluq", "top_echelonize", "rank",
                "invert", "echelonize_naive", "gauss_delayed"):
        from .models import echelon as _m
        return getattr(_m, name)
    if name in ("trsm_lower_left", "trsm_upper_left", "trsm_lower_right",
                "trsm_upper_right", "trtri_upper", "trtri_lower"):
        from .models import triangular as _m
        return getattr(_m, name)
    if name in ("solve_left", "kernel_left", "pluq_solve_left"):
        from .models import solve as _m
        return getattr(_m, name)
    if name in ("mul_m4rm", "addmul_m4rm"):
        from .ops import m4rm as _m
        return getattr(_m, name)
    if name in ("djb_compile", "djb_apply"):
        from .models import djb as _m
        return getattr(_m, name)
    if name in ("read_bits", "xor_bits", "and_bits", "clear_bits", "row_add",
                "row_add_offset", "extract_u", "extract_l", "find_pivot",
                "set_ui"):
        from .core import bitops as _m
        return getattr(_m, name)
    raise AttributeError(name)
