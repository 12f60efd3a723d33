"""Reference-API compatibility surface: a program written against the mzd_*
names must run unchanged (modulo functional return values)."""

import numpy as np

import m4ri_tpu.compat as m4ri
import m4ri_tpu as m4

import oracle
from conftest import random_dense


def test_reference_style_program(rng):
    """The canonical reference usage pattern, straight from its README."""
    m4ri.m4ri_srandom(17)
    A = m4ri.mzd_init(100, 100)
    A = m4ri.mzd_randomize(A)
    B = m4ri.mzd_init(100, 100)
    B = m4ri.mzd_randomize(B)

    C = m4ri.mzd_mul(None, A, B, 0)
    C2 = m4ri.mzd_mul_naive(None, A, B)
    C3 = m4ri.mzd_mul_m4rm(None, A, B, 0)
    assert bool(m4ri.mzd_equal(C, C2)) and bool(m4ri.mzd_equal(C, C3))

    E, r = m4ri.mzd_echelonize(m4ri.mzd_copy(None, A), full=True)
    a_np = m4.to_numpy(A)
    assert int(r) == oracle.rank(a_np)
    np.testing.assert_array_equal(m4.to_numpy(E), oracle.rref(a_np))

    M, P, Q, rr = m4ri.mzd_ple(m4ri.mzd_copy(None, A), None, None, 0)
    assert int(rr) == int(r)

    X, ok = m4ri.mzd_solve_left(A, C, 0, 1)
    assert bool(ok)
    np.testing.assert_array_equal(oracle.mul(a_np, m4.to_numpy(X)),
                                  m4.to_numpy(C))

    inv = m4ri.mzd_inv_m4ri(None, A, 0) if int(r) == 100 else None
    if inv is not None:
        np.testing.assert_array_equal(oracle.mul(a_np, m4.to_numpy(inv)),
                                      np.eye(100, dtype=np.uint8))


def test_compat_bit_ops(rng):
    a = random_dense(rng, 10, 70)
    A = m4.from_numpy(a)
    assert int(m4ri.mzd_read_bit(A, 3, 40)) == a[3, 40]
    B = m4ri.mzd_row_add(A, 0, 5)
    expect = a.copy()
    expect[5] ^= expect[0]
    np.testing.assert_array_equal(m4.to_numpy(B), expect)
    T = m4ri.mzd_transpose(None, A)
    np.testing.assert_array_equal(m4.to_numpy(T), a.T)
    W = m4ri.mzd_init_window(A, 2, 3, 8, 40)
    np.testing.assert_array_equal(m4.to_numpy(W), a[2:8, 3:40])


def test_compat_randomize_matches_reference_stream():
    m4ri.m4ri_srandom(17)
    A = m4ri.mzd_randomize(m4ri.mzd_init(7, 100))
    B = m4.randomize_reference(7, 100, seed=17)
    assert bool(m4.equal(A, B))


def test_compat_trsm(rng):
    n = 64
    u = np.triu(random_dense(rng, n, n), 1) ^ np.eye(n, dtype=np.uint8)
    b = random_dense(rng, n, 32)
    X = m4ri.mzd_trsm_upper_left(m4.from_numpy(u), m4.from_numpy(b), 0)
    np.testing.assert_array_equal(oracle.mul(u, m4.to_numpy(X)), b)


def test_randomize_advances_stream():
    """Successive un-seeded mzd_randomize calls must differ (the reference
    advances its RNG stream on every call)."""
    from m4ri_tpu import compat
    a = compat.mzd_init(32, 32)
    m1 = compat.mzd_randomize(a)
    m2 = compat.mzd_randomize(a)
    assert not np.array_equal(m4.to_numpy(m1), m4.to_numpy(m2))


def test_inv_m4ri_raises_on_singular(rng):
    """The reference m4ri_die()s on non-invertible input; we raise."""
    import pytest as _pytest
    from m4ri_tpu import compat
    a = np.zeros((16, 16), np.uint8)
    a[0, 0] = 1  # rank 1
    with _pytest.raises(ValueError, match="not invertible"):
        compat.mzd_inv_m4ri(None, m4.from_numpy(a))
    # and a genuinely invertible one still works
    u = np.triu(random_dense(rng, 16, 16), 1)
    np.fill_diagonal(u, 1)
    inv = compat.mzd_inv_m4ri(None, m4.from_numpy(u))
    import oracle
    np.testing.assert_array_equal(
        oracle.mul(u, m4.to_numpy(inv)), np.eye(16, dtype=np.uint8))
