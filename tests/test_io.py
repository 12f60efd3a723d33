"""I/O tests (reference: tests/test_misc.c PNG round-trip, mzd_from_str
usage throughout test_ple.c/test_pluq.c)."""

import numpy as np

import m4ri_tpu as m4
from m4ri_tpu.utils import io

from conftest import random_dense


def test_from_to_str():
    A = io.from_str(2, 3, "101010")
    np.testing.assert_array_equal(m4.to_numpy(A),
                                  [[1, 0, 1], [0, 1, 0]])
    assert io.to_str(A) == "101010"


def test_jcf_roundtrip(rng, tmp_path):
    a = random_dense(rng, 17, 40, density=0.2)
    A = m4.from_numpy(a)
    path = str(tmp_path / "m.jcf")
    io.to_jcf(A, path)
    B = io.from_jcf(path)
    assert bool(m4.equal(A, B))


def test_png_roundtrip(rng, tmp_path):
    a = random_dense(rng, 33, 70)
    A = m4.from_numpy(a)
    path = str(tmp_path / "m.png")
    io.write_png(A, path)
    B = io.read_png(path)
    assert bool(m4.equal(A, B))


def test_info(rng):
    a = random_dense(rng, 10, 20)
    s = io.info(m4.from_numpy(a), compute_rank=True)
    assert "10 x 20" in s and "rank" in s


def test_to_text():
    A = io.from_str(1, 3, "101")
    assert io.to_text(A) == "[1 1]"


def test_hash_changes(rng):
    from m4ri_tpu.utils.hashing import matrix_hash
    a = random_dense(rng, 8, 8)
    h1 = int(matrix_hash(m4.from_numpy(a)))
    b = a.copy()
    b[3, 3] ^= 1
    h2 = int(matrix_hash(m4.from_numpy(b)))
    assert h1 != h2
    # order-sensitive: swapped rows hash differently
    c = a[::-1].copy()
    if not np.array_equal(a, c):
        assert int(matrix_hash(m4.from_numpy(c))) != h1


def test_npz_roundtrip(rng, tmp_path):
    a = random_dense(rng, 33, 100)
    A = m4.from_numpy(a)
    p = str(tmp_path / "m.npz")
    io.save_npz(A, p)
    assert bool(m4.equal(io.load_npz(p), A))


def test_randomize_custom():
    from m4ri_tpu.core.bitmatrix import randomize_custom
    from m4ri_tpu.utils.rng import GlibcRandom
    g = GlibcRandom(17)
    A = randomize_custom(5, 100, g.random_word)
    B = m4.randomize_reference(5, 100, seed=17)
    assert bool(m4.equal(A, B))
