"""Echelonization tests (reference: tests/test_elimination.c — several
independent elimination paths must agree; RREF is unique over GF(2), so the
TPU engine must match the numpy Gauss oracle bit-for-bit)."""

import numpy as np
import pytest

import m4ri_tpu as m4
from m4ri_tpu.models.echelon import echelonize, rank

import oracle
from conftest import random_dense

SIZES = [(4, 4), (32, 32), (37, 29), (64, 128), (128, 64), (128, 128),
         (200, 200), (256, 177)]


@pytest.mark.parametrize("m,n", SIZES)
def test_rref_bit_exact(rng, m, n):
    a = random_dense(rng, m, n)
    R, r = echelonize(m4.from_numpy(a), full=True)
    np.testing.assert_array_equal(m4.to_numpy(R), oracle.rref(a))
    assert int(r) == oracle.rank(a)


@pytest.mark.parametrize("m,n", [(64, 64), (128, 96), (100, 150)])
def test_rref_low_rank(rng, m, n):
    k = min(m, n) // 3
    a = oracle.mul(random_dense(rng, m, k), random_dense(rng, k, n)).astype(
        np.uint8)
    R, r = echelonize(m4.from_numpy(a), full=True)
    np.testing.assert_array_equal(m4.to_numpy(R), oracle.rref(a))
    assert int(r) == oracle.rank(a)
    assert int(r) <= k


@pytest.mark.parametrize("m,n", [(64, 64), (96, 128), (130, 70)])
def test_ref_non_reduced(rng, m, n):
    """full=False: result is in echelon form and row-equivalent to A."""
    a = random_dense(rng, m, n)
    R, r = echelonize(m4.from_numpy(a), full=False)
    r = int(r)
    Rd = m4.to_numpy(R)
    # rows >= r are zero
    assert not Rd[r:].any()
    # pivot structure: leading-1 columns strictly increase
    lead = [np.argmax(Rd[i]) for i in range(r)]
    assert all(Rd[i, lead[i]] == 1 for i in range(r))
    assert all(lead[i] < lead[i + 1] for i in range(r - 1))
    # row-equivalent: same RREF
    np.testing.assert_array_equal(oracle.rref(Rd), oracle.rref(a))


@pytest.mark.parametrize("m,n", [(64, 64), (100, 150), (128, 90)])
def test_elimination_paths_agree(rng, m, n):
    """Independent engines must produce identical results (reference:
    test_elimination.c elim_test_equality compares 7 paths)."""
    from m4ri_tpu.models.echelon import echelonize_pluq, top_echelonize
    a = random_dense(rng, m, n)
    A = m4.from_numpy(a)
    expect = oracle.rref(a)
    for path in [
        echelonize(A, full=True),
        echelonize(A, full=True, strategy="heuristic"),
        echelonize_pluq(A, full=True),
        top_echelonize(A),              # random matrices: window suffices
        top_echelonize(A, k=4),
    ]:
        R, r = path
        np.testing.assert_array_equal(m4.to_numpy(R), expect)
        assert int(r) == oracle.rank(a)
    # non-reduced paths agree with each other
    R1, r1 = echelonize(A, full=False)
    R2, r2 = echelonize_pluq(A, full=False)
    assert int(r1) == int(r2)
    np.testing.assert_array_equal(m4.to_numpy(R1), m4.to_numpy(R2))


def test_rank_only(rng):
    a = random_dense(rng, 150, 90)
    assert int(rank(m4.from_numpy(a))) == oracle.rank(a)
    assert int(rank(m4.from_numpy(np.zeros((10, 10), np.uint8)))) == 0
    assert int(rank(m4.identity(65))) == 65
