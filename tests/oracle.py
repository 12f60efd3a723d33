"""Pure-numpy GF(2) oracle — an implementation independent of both the JAX
engine and the C++ native oracle, mirroring the reference test strategy of
cross-validating independent algorithms (tests/test_multiplication.c)."""

import numpy as np


def mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.int64) @ b.astype(np.int64)) % 2


def rank(a: np.ndarray) -> int:
    a = a.copy().astype(np.uint8)
    m, n = a.shape
    r = 0
    for c in range(n):
        if r == m:
            break
        piv = np.nonzero(a[r:, c])[0]
        if len(piv) == 0:
            continue
        p = r + piv[0]
        a[[r, p]] = a[[p, r]]
        rows = np.nonzero(a[:, c])[0]
        rows = rows[rows != r]
        a[rows] ^= a[r]
        r += 1
    return r


def rref(a: np.ndarray) -> np.ndarray:
    """Reduced row echelon form (unique over GF(2))."""
    a = a.copy().astype(np.uint8)
    m, n = a.shape
    r = 0
    for c in range(n):
        if r == m:
            break
        piv = np.nonzero(a[r:, c])[0]
        if len(piv) == 0:
            continue
        p = r + piv[0]
        a[[r, p]] = a[[p, r]]
        rows = np.nonzero(a[:, c])[0]
        rows = rows[rows != r]
        a[rows] ^= a[r]
        r += 1
    return a
