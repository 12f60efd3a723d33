"""Distributed (multi-device mesh) tests — run on the 8-device virtual CPU
mesh (conftest).  Reference analogue: tests of mzd_mul_mp vs serial paths in
test_multiplication.c; here the OpenMP 2x2 split became a 2-D SPMD mesh."""

import numpy as np
import pytest

import m4ri_tpu as m4
from m4ri_tpu.parallel.dist_mul import mul_dist, mul_dist_ksplit
from m4ri_tpu.parallel.mesh import make_mesh

import oracle
from conftest import random_dense


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


@pytest.mark.parametrize("m,k,n", [(64, 64, 64), (128, 256, 192),
                                   (100, 130, 70), (257, 129, 65)])
def test_mul_dist_summa(rng, mesh, m, k, n):
    a = random_dense(rng, m, k)
    b = random_dense(rng, k, n)
    C = mul_dist(m4.from_numpy(a), m4.from_numpy(b), mesh)
    np.testing.assert_array_equal(m4.to_numpy(C), oracle.mul(a, b))


@pytest.mark.parametrize("m,k,n", [(64, 256, 64), (96, 512, 160)])
def test_mul_dist_ksplit(rng, mesh, m, k, n):
    a = random_dense(rng, m, k)
    b = random_dense(rng, k, n)
    C = mul_dist_ksplit(m4.from_numpy(a), m4.from_numpy(b), mesh)
    np.testing.assert_array_equal(m4.to_numpy(C), oracle.mul(a, b))


def test_mesh_shape(mesh):
    assert mesh.devices.size == 8


def test_dryrun_entry():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as g
    fn, args = g.entry()
    import jax
    out = jax.jit(fn)(*args)
    assert out.shape == (2048, 64)
    g.dryrun_multichip(8)
