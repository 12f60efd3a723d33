"""Reference-API compatibility layer: the mzd_* / mzp_* surface.

A user of the reference C library can keep their call names: every public
function of m4ri/m4ri.h:57-71 has a counterpart here with matching
semantics (functional instead of in-place: mutators return the new matrix).
Cutoff/k tuning parameters are accepted and ignored where the TPU engine
auto-tunes (the reference recommends passing 0 for auto anyway).
"""

from __future__ import annotations

import jax

from . import (add, addmul, col_swap, concat, density, echelonize,
               echelonize_pluq, equal, from_numpy, identity, invert, is_zero,
               kernel_left, mul, mul_naive, ple, pluq, randomize,
               randomize_reference, rank, read_bit, row_swap, solve_left,
               stack, submatrix, to_numpy, top_echelonize, transpose,
               write_bit, zeros)
from .core import bitops
from .core.bitmatrix import BitMatrix, randomize_custom
from .core.permutation import (apply_p_left, apply_p_left_trans,
                               apply_p_right, apply_p_right_trans,
                               apply_p_right_trans_tri)
from .models.djb import djb_apply, djb_compile
from .models.triangular import (trsm_lower_left, trsm_lower_right,
                                trsm_upper_left, trsm_upper_right,
                                trtri_lower, trtri_upper)
from .ops.m4rm import addmul_m4rm, mul_m4rm
from .utils import io
from .utils.hashing import matrix_hash
from .utils.rng import GlibcRandom

import jax.numpy as jnp
import numpy as np

__all__ = [n for n in dir() if n.startswith(("mzd_", "mzp_", "m4ri_"))]


# --- container -----------------------------------------------------------

def mzd_init(nrows, ncols):
    return zeros(nrows, ncols)


def mzd_copy(dst, src):
    return BitMatrix(src.data, src.ncols)


def mzd_free(a):  # no-op: functional arrays are garbage collected
    return None


mzd_transpose = lambda dst, a=None: transpose(a if a is not None else dst)
mzd_stack = lambda dst, a, b=None: stack(a, b) if b is not None else stack(dst, a)
mzd_concat = lambda dst, a, b=None: concat(a, b) if b is not None else concat(dst, a)


def mzd_submatrix(dst, a, r0, c0, r1, c1):
    return submatrix(a, r0, c0, r1, c1)


def mzd_init_window(a, r0, c0, r1, c1):
    # zero-copy in the reference; a trace-time slice here
    return submatrix(a, r0, c0, r1, c1)


mzd_set_ui = bitops.set_ui
mzd_is_zero = is_zero
mzd_equal = equal
mzd_density = lambda a, res=0: density(a)
mzd_randomize = None  # assigned below (needs seed handling)


_GLOBAL_RNG = {"rng": None}


def m4ri_srandom(seed: int) -> None:
    _GLOBAL_RNG["rng"] = GlibcRandom(seed)


def m4ri_random_word() -> int:
    if _GLOBAL_RNG["rng"] is None:
        _GLOBAL_RNG["rng"] = GlibcRandom(0)
    return _GLOBAL_RNG["rng"].random_word()


_RANDOMIZE_CALLS = [0]


def mzd_randomize(a: BitMatrix) -> BitMatrix:
    """Uses the reference's glibc stream if m4ri_srandom was called, else
    a fast jax.random fill.  Like the reference, every call advances the
    stream: successive un-seeded calls fold a call counter into the key
    instead of repeating PRNGKey(0)."""
    if _GLOBAL_RNG["rng"] is not None:
        return randomize_reference(a.nrows, a.ncols, rng=_GLOBAL_RNG["rng"])
    _RANDOMIZE_CALLS[0] += 1
    return randomize(a.nrows, a.ncols, jax.random.PRNGKey(_RANDOMIZE_CALLS[0]))


def mzd_randomize_custom(a, rc, data=None):
    return randomize_custom(a.nrows, a.ncols,
                            (lambda: rc(data)) if data is not None else rc)


# --- bit access ----------------------------------------------------------

mzd_read_bit = read_bit
mzd_write_bit = write_bit
mzd_read_bits = bitops.read_bits
mzd_read_bits_int = bitops.read_bits
mzd_xor_bits = bitops.xor_bits
mzd_and_bits = bitops.and_bits
mzd_clear_bits = bitops.clear_bits
mzd_row_swap = row_swap
mzd_col_swap = col_swap
mzd_row_add = bitops.row_add
mzd_row_add_offset = lambda a, dst, src, off: bitops.row_add_offset(
    a, dst, src, off)
mzd_extract_u = lambda dst, a=None: bitops.extract_u(a if a is not None else dst)
mzd_extract_l = lambda dst, a=None: bitops.extract_l(a if a is not None else dst)
mzd_find_pivot = bitops.find_pivot


def mzd_col_swap_in_rows(a, c1, c2, start_row, stop_row):
    i = jnp.arange(a.nrows)
    mask = (i >= start_row) & (i < stop_row)
    swapped = col_swap(a, c1, c2)
    data = jnp.where(mask[:, None], swapped.data, a.data)
    return BitMatrix(data, a.ncols)


# --- arithmetic ----------------------------------------------------------

def mzd_add(c, a, b=None):
    return add(a, b) if b is not None else add(c, a)


mzd_sub = mzd_add  # GF(2): identical


def mzd_mul(c, a, b, cutoff=0):
    return mul(a, b)


def mzd_addmul(c, a, b, cutoff=0):
    return addmul(c, a, b)


def mzd_mul_naive(c, a, b):
    return mul_naive(a, b)


def mzd_addmul_naive(c, a, b):
    return add(c, mul_naive(a, b))


def mzd_mul_m4rm(c, a, b, k=0):
    return mul_m4rm(a, b, k)


def mzd_addmul_m4rm(c, a, b, k=0):
    return addmul_m4rm(c, a, b, k)


def mzd_mul_mp(c, a, b, cutoff=0):
    """OpenMP multiply analogue: SPMD over the device mesh (mp.c:39)."""
    from .parallel.dist_mul import mul_dist
    from .parallel.mesh import make_mesh
    return mul_dist(a, b, make_mesh())


# --- elimination / factorization ----------------------------------------

def mzd_echelonize(a, full=True):
    return echelonize(a, full=full, strategy="heuristic")


def mzd_echelonize_m4ri(a, full=True, k=0):
    return echelonize(a, full=full)


def mzd_echelonize_pluq(a, full=True):
    return echelonize_pluq(a, full=full)


def mzd_top_echelonize_m4ri(a, k=0):
    return top_echelonize(a, k)


def mzd_ple(a, p=None, q=None, cutoff=0):
    """Returns (A_inplace, P, Q, rank) — the reference writes P/Q into the
    preallocated mzp_t arguments and returns the rank."""
    return ple(a)


def mzd_pluq(a, p=None, q=None, cutoff=0):
    return pluq(a)


def mzd_inv_m4ri(dst, src, k=0):
    """Inversion; raises on singular input like the reference's
    m4ri_die("A is not invertible") (brilliantrussian.c:984)."""
    inv, r = invert(src)
    if int(r) != src.ncols:
        raise ValueError(
            f"mzd_inv_m4ri: matrix is not invertible (rank {int(r)} < "
            f"{src.ncols})")
    return inv


def mzd_solve_left(a, b, cutoff=0, inconsistency_check=1):
    return solve_left(a, b)


def mzd_invert_naive(dst, src, identity_arg=None):
    """Independent naive-Gauss inversion engine (reference:
    mzd_invert_naive, mzd.c); returns None on singular input like the
    reference returns NULL."""
    from .models.echelon import invert_naive
    inv, ok = invert_naive(src)
    return inv if bool(ok) else None


def mzd_mul_va(c, v, a, clear=True):
    """Vector-matrix product C = v * A (reference: mzd_mul_va,
    mzd.c:1256-1268); v is a 1 x m matrix."""
    out = mul(v, a)
    if not clear and c is not None:
        out = add(c, out)
    return out


def mzd_kernel_left_pluq(a, cutoff=0):
    return kernel_left(a)


mzd_trsm_upper_left = lambda u, b, cutoff=0: trsm_upper_left(u, b)
mzd_trsm_lower_left = lambda l, b, cutoff=0: trsm_lower_left(l, b)
mzd_trsm_upper_right = lambda u, b, cutoff=0: trsm_upper_right(u, b)
mzd_trsm_lower_right = lambda l, b, cutoff=0: trsm_lower_right(l, b)
mzd_trtri_upper = trtri_upper


# --- permutations (mzp_t) ------------------------------------------------

def mzp_init(length):
    return jnp.arange(length, dtype=jnp.int32)


def mzp_set_ui(p, value=1):
    return jnp.arange(p.shape[0], dtype=jnp.int32)


mzd_apply_p_left = apply_p_left
mzd_apply_p_left_trans = apply_p_left_trans
mzd_apply_p_right = apply_p_right
mzd_apply_p_right_trans = apply_p_right_trans
mzd_apply_p_right_trans_tri = apply_p_right_trans_tri


# --- io / misc -----------------------------------------------------------

mzd_from_str = io.from_str
mzd_from_jcf = lambda fn, verbose=0: io.from_jcf(fn)
mzd_to_png = lambda a, fn, compression=9, comment="", verbose=0: io.write_png(a, fn)
mzd_from_png = lambda fn, verbose=0: io.read_png(fn)
mzd_info = lambda a, do_rank=0: print(io.info(a, bool(do_rank)))
mzd_print = lambda a: print(io.to_text(a))
mzd_hash = matrix_hash
djb_compile_ = djb_compile
djb_apply_mzd = lambda prog, w, v: djb_apply(prog, v)


# --- additions: remaining public surface ---------------------------------

from .models.echelon import echelonize_naive as _echelonize_naive
from .models.echelon import gauss_delayed as _gauss_delayed
from .models.solve import pluq_solve_left as _pluq_solve_left
from .utils.bits import word_to_str as m4ri_word_to_str  # noqa: F401


def mzd_echelonize_naive(a, full=True):
    return _echelonize_naive(a, full=full)


def mzd_gauss_delayed(a, startcol=0, full=False):
    return _gauss_delayed(a, start_col=startcol, full=full)


def mzd_pluq_solve_left(a_factored, rank, p, q, b, cutoff=0, check=1):
    return _pluq_solve_left(a_factored, p, q, rank, b)


mzd_cmp = bitops.cmp
mzd_copy_row = lambda m, dst, src_mat, src: bitops.copy_row(m, dst, src_mat, src)
mzd_row_clear_offset = bitops.row_clear_offset
mzd_first_zero_row = bitops.first_zero_row


def mzd_fprint_row(a, i):
    print(io.to_text(submatrix(a, i, 0, i + 1, a.ncols)))
