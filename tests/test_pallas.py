"""Automated coverage for the Pallas production kernels.

The fused GF(2) matmul kernel (ops/pallas_mul.py) and the panel pivot-loop
kernel (ops/pallas_panel.py) are the TPU production paths for every large
product / factorization, but the CPU suite never executed them in round 1
(they are gated on jax.default_backend() == "tpu").  These tests run both
under ``pallas_call(interpret=True)`` so a kernel or layout regression
turns the suite red; mirror tests marked ``tpu`` run the real Mosaic
lowering when M4RI_TPU_TEST_PLATFORM=tpu (reference analogue: every-engine
cross-checking in tests/test_multiplication.c)."""

import numpy as np
import pytest

import m4ri_tpu as m4
from m4ri_tpu.ops.pallas_mul import gf2_mul_pallas

import oracle
from conftest import random_dense

import jax
import jax.numpy as jnp

ON_TPU = jax.default_backend() == "tpu"
tpu_only = pytest.mark.skipif(not ON_TPU, reason="needs real TPU")


def _mul_case(rng, m, k, n, tm, tnw, interpret):
    a = random_dense(rng, m, k)
    b = random_dense(rng, k, n)
    A, B = m4.from_numpy(a), m4.from_numpy(b)
    out = gf2_mul_pallas(A.data, B.data, tm=tm, tnw=tnw, interpret=interpret)
    got = m4.to_numpy(m4.BitMatrix(out, n))
    np.testing.assert_array_equal(got, oracle.mul(a, b),
                                  err_msg=f"{m}x{k}x{n} tm={tm} tnw={tnw}")


@pytest.mark.parametrize("m,k,n,tm,tnw", [
    # shallow-k branch (Schur-update shape: kw <= 32)
    (256, 128, 4096, 256, 128),
    # deep contraction: multiple k-chunks through the double-buffered DMA
    (256, 2048, 4096, 256, 32),
    # multi-tile grid in both m and n, ragged edges
    (300, 1100, 4200, 128, 32),
])
def test_pallas_mul_interpret(rng, m, k, n, tm, tnw):
    _mul_case(rng, m, k, n, tm, tnw, interpret=True)


def test_pallas_mul_b_row_permutation_interpret(rng):
    """The plane-layout B-row permutation is the kernel's subtlest piece;
    a structured B (single set bit per row block) pins it exactly."""
    k, n = 1024, 4096
    b = np.zeros((k, n), np.uint8)
    b[np.arange(k), np.arange(k) % n] = 1  # shifted identity
    a = random_dense(np.random.default_rng(5), 128, k)
    A, B = m4.from_numpy(a), m4.from_numpy(b)
    out = gf2_mul_pallas(A.data, B.data, tm=128, tnw=32, interpret=True)
    np.testing.assert_array_equal(
        m4.to_numpy(m4.BitMatrix(out, n)), oracle.mul(a, b))


def test_pallas_panel_interpret_matches_xla(rng):
    """block_factor with the Mosaic pivot-loop kernel (interpreted) must be
    bit-identical to the XLA loop — data, P, Q and rank — including the
    below-window batch elimination and the miss fallback."""
    from m4ri_tpu.models.ple import block_factor
    cases = []
    a = random_dense(rng, 100, 64)
    cases.append(a)
    z = random_dense(rng, 160, 96)
    z[10:90] = 0  # forces the miss fallback at W=32
    cases.append(z)
    for a_np in cases:
        A = m4.from_numpy(a_np)
        for pres in (False, True):
            want = block_factor(A, preserve_l=pres, nb=32, window=32,
                                engine="xla")
            got = block_factor(A, preserve_l=pres, nb=32, window=32,
                               engine="pallas_interpret")
            for g, w, what in zip(got, want, ["data", "P", "Q", "rank"]):
                np.testing.assert_array_equal(
                    np.asarray(g), np.asarray(w),
                    err_msg=f"preserve_l={pres}: {what}")


def _schur_case(rng, m, k, n, r0, c0, tm, tnw, interpret):
    """c ^ lp@up with lp rows < r0 and up cols < c0 zeroed (the panel
    factorization's structural contract) — the kernel must be exact for
    every (r0, c0) tile-boundary alignment."""
    from m4ri_tpu.ops.pallas_schur import gf2_schur_update
    c = random_dense(rng, m, n)
    lp = random_dense(rng, m, k)
    up = random_dense(rng, k, n)
    lp[:r0] = 0
    up[:, :c0] = 0
    want = c ^ oracle.mul(lp, up)
    C, L, U = m4.from_numpy(c), m4.from_numpy(lp), m4.from_numpy(up)
    out = gf2_schur_update(C.data, L.data, U.data, r0, c0 // 32,
                           tm=tm, tnw=tnw, interpret=interpret)
    np.testing.assert_array_equal(
        m4.to_numpy(m4.BitMatrix(out, n)), want,
        err_msg=f"m={m} k={k} n={n} r0={r0} c0={c0} tm={tm} tnw={tnw}")


@pytest.mark.parametrize("r0,c0", [
    (0, 0),            # nothing skipped
    (64, 1024),        # tile-aligned skip region
    (96, 1536),        # bounds inside a tile (partial tiles stay active)
    (256, 4096),       # everything skipped: pure passthrough
])
def test_pallas_schur_update_interpret(rng, r0, c0):
    _schur_case(rng, 256, 128, 4096, r0, c0, tm=64, tnw=32, interpret=True)


def test_pallas_schur_update_shallow_k_interpret(rng):
    # the production shape class: kw = nb/32 words of multipliers
    _schur_case(rng, 512, 256, 2048, 128, 512, tm=128, tnw=64,
                interpret=True)


def test_pallas_schur_col_tile_skip_interpret(rng):
    """col_tile_skip must be a pure no-op on the result whenever the
    skipped tiles lie left of the zero-column region of up."""
    from m4ri_tpu.ops.pallas_schur import gf2_schur_update
    m, k, n = 256, 128, 4096 * 2  # nw = 256 words = 2 tiles of 128
    c = random_dense(rng, m, n)
    lp = random_dense(rng, m, k)
    up = random_dense(rng, k, n)
    lp[:64] = 0
    up[:, : 128 * 32] = 0  # first column tile entirely zero
    C, L, U = m4.from_numpy(c), m4.from_numpy(lp), m4.from_numpy(up)
    base = gf2_schur_update(C.data, L.data, U.data, 64, 128,
                            tm=64, tnw=128, interpret=True)
    skip = gf2_schur_update(C.data, L.data, U.data, 64, 128,
                            tm=64, tnw=128, col_tile_skip=1, interpret=True)
    np.testing.assert_array_equal(np.asarray(skip), np.asarray(base))
    np.testing.assert_array_equal(
        m4.to_numpy(m4.BitMatrix(skip, n)), c ^ oracle.mul(lp, up))


def test_block_factor_grouped_col_skip_interpret(rng):
    """The grouped panel sweep (one scan per Schur column tile) must be
    bit-identical to the ungrouped XLA engine — P, Q, rank and layout."""
    from m4ri_tpu.models.ple import block_factor
    a = random_dense(rng, 320, 8192)  # w_pad = 256 words = 2 column tiles
    a[100:200] = 0
    A = m4.from_numpy(a)
    want = block_factor(A, preserve_l=True, engine="xla")
    got = block_factor(A, preserve_l=True, engine="pallas_interpret")
    for g, w, what in zip(got, want, ["data", "P", "Q", "rank"]):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                      err_msg=what)


def test_panel_post_interpret(rng):
    """The fused below-window pass must equal the unfused composition
    lam = X (E^T T), v = X ^ lam wmat, miss = any(v & colmask) on the
    below-window rows, with passthrough elsewhere."""
    from m4ri_tpu.ops.pallas_post import panel_post
    nb, m = 64, 512
    x = random_dense(rng, m, nb)
    msm = (rng.random((nb, nb)) < 0.5).astype(np.int8)
    wm = (rng.random((nb, nb)) < 0.5).astype(np.int8)
    cmb = (rng.random(nb) < 0.2).astype(np.int8)
    below0, mvalid = 192, 500
    X = m4.from_numpy(x)
    vw, lamw, miss = panel_post(X.data, jnp.asarray(msm), jnp.asarray(wm),
                                jnp.asarray(cmb), below0, mvalid,
                                interpret=True)
    lam_ref = (x.astype(np.int64) @ msm.astype(np.int64)) % 2
    rows = (np.arange(m) >= below0) & (np.arange(m) < mvalid)
    lam_ref[~rows] = 0
    v_ref = x ^ (lam_ref @ wm.astype(np.int64)) % 2
    v_ref[~rows] = x[~rows]
    np.testing.assert_array_equal(
        m4.to_numpy(m4.BitMatrix(vw, nb)), v_ref)
    np.testing.assert_array_equal(
        m4.to_numpy(m4.BitMatrix(lamw, nb)), lam_ref)
    want_miss = bool(((v_ref * cmb[None, :])[rows]).any())
    assert bool(miss) == want_miss


def test_block_factor_search_window_interpret(rng):
    """Restricted pivot search (top-echelonize semantics) through the
    pallas engines must match the XLA engine bit for bit."""
    from m4ri_tpu.models.ple import block_factor
    a = random_dense(rng, 400, 256)
    a[50:150] = 0
    A = m4.from_numpy(a)
    want = block_factor(A, preserve_l=False, nb=128, window=256,
                        search_window=128, engine="xla")
    got = block_factor(A, preserve_l=False, nb=128, window=256,
                       search_window=128, engine="pallas_interpret")
    for g, w, what in zip(got, want, ["data", "P", "Q", "rank"]):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                      err_msg=what)


def test_pallas_mul_odd_word_count_interpret(rng):
    # kw = ceil(150/32) = 5: not 8-sublane aligned — the word axis must be
    # padded before the (tkw, tm) DMA chunks (Mosaic rejects unaligned
    # sublane slices; regression for a real-TPU compile failure).
    _mul_case(rng, 256, 150, 4096, 128, 32, interpret=True)


def test_pallas_schur_update_odd_word_count_interpret(rng):
    _schur_case(rng, 256, 150, 1024, 64, 0, tm=64, tnw=32, interpret=True)


@tpu_only
def test_pallas_mul_tpu(rng):
    _mul_case(rng, 512, 2048, 4096, 256, 32, interpret=False)


@tpu_only
def test_pallas_mul_odd_word_count_tpu(rng):
    # exercises the real Mosaic lowering at kw=5 (alignment regression)
    _mul_case(rng, 512, 150, 4096, 256, 32, interpret=False)


@tpu_only
def test_pallas_schur_update_odd_word_count_tpu(rng):
    _schur_case(rng, 512, 150, 4096, 64, 1024, tm=256, tnw=128,
                interpret=False)


@tpu_only
def test_block_factor_grouped_col_skip_tpu(rng):
    """The grouped (col_tile_skip) sweep on real hardware must match the
    XLA engine bit for bit — n=8192 gives two Schur column tiles."""
    from m4ri_tpu.models.ple import block_factor
    a = random_dense(rng, 320, 8192)
    a[64:128] = 0
    A = m4.from_numpy(a)
    want = block_factor(A, preserve_l=True, engine="xla")
    got = block_factor(A, preserve_l=True, engine="pallas")
    for g, w, what in zip(got, want, ["data", "P", "Q", "rank"]):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                      err_msg=what)


@tpu_only
def test_ple_small_odd_width_tpu(rng):
    """End-to-end PLE of a 200x150 matrix on the production TPU path (the
    shape class that exposed the kw=5 Mosaic alignment failure)."""
    a = random_dense(rng, 200, 150)
    A = m4.from_numpy(a)
    from m4ri_tpu.models.ple import block_factor
    want = block_factor(A, preserve_l=True, engine="xla")
    got = block_factor(A, preserve_l=True)  # engine auto: pallas on TPU
    for g, w, what in zip(got, want, ["data", "P", "Q", "rank"]):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                      err_msg=what)


@tpu_only
def test_pallas_schur_update_tpu(rng):
    _schur_case(rng, 512, 256, 4096, 192, 1536, tm=256, tnw=128,
                interpret=False)


@tpu_only
def test_pallas_panel_tpu(rng):
    from m4ri_tpu.models.ple import block_factor
    a = random_dense(rng, 700, 300)
    a[100:400] = 0
    A = m4.from_numpy(a)
    for pres in (False, True):
        want = block_factor(A, preserve_l=pres, nb=128, window=256,
                            engine="xla")
        got = block_factor(A, preserve_l=pres, nb=128, window=256,
                           engine="pallas")
        for g, w, what in zip(got, want, ["data", "P", "Q", "rank"]):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                          err_msg=what)


def test_autotune_cache_roundtrip(tmp_path, monkeypatch):
    """The per-shape tile cache must persist and be consulted by
    gf2_mul_pallas's default tile selection."""
    import importlib
    from m4ri_tpu.ops import pallas_mul as pm
    monkeypatch.setattr(pm, "_TUNE_PATH", str(tmp_path / "tune.json"))
    monkeypatch.setattr(pm, "_TUNE", None)
    cache = pm._tune_cache()
    cache[pm._tune_key(256, 4, 128)] = [128, 64]
    # a lookup for a matching bucket returns the stored tiles: verify via
    # a correct product through the interpreted kernel at those tiles
    a = np.random.default_rng(0).integers(0, 2, (256, 128)).astype(np.uint8)
    b = np.random.default_rng(1).integers(0, 2, (128, 4096)).astype(np.uint8)
    A, B = m4.from_numpy(a), m4.from_numpy(b)
    out = pm.gf2_mul_pallas(A.data, B.data, interpret=True)
    np.testing.assert_array_equal(
        m4.to_numpy(m4.BitMatrix(out, 4096)), oracle.mul(a, b))


@pytest.mark.parametrize("r0,c0w", [
    (0, 0), (100, 16), (256, 128), (512, 128), (37, 5), (511, 127),
])
def test_pallas_schur_dyn_interpret(rng, r0, c0w):
    """The fully-dynamic pipeline kernel (gf2_schur_update_dyn) must match
    C ^ Lp@Up under the contract (lp rows above r0 zero, up cols left of
    word c0w zero), including the zero-trip full-skip case."""
    from m4ri_tpu.ops.pallas_schur import gf2_schur_update_dyn
    m, nw, kw = 512, 128, 8
    c = random_dense(rng, m, nw * 32)
    lp = random_dense(rng, m, kw * 32)
    up = random_dense(rng, kw * 32, nw * 32)
    lp[:r0] = 0
    up[:, : c0w * 32] = 0
    C, L, U = m4.from_numpy(c), m4.from_numpy(lp), m4.from_numpy(up)
    out = gf2_schur_update_dyn(C.data, L.data, U.data, r0, c0w,
                               tm=256, tnw=128, interpret=True)
    np.testing.assert_array_equal(
        m4.to_numpy(m4.BitMatrix(out, nw * 32)), c ^ oracle.mul(lp, up))


def test_block_factor_schur_dyn_interpret(rng, monkeypatch):
    """block_factor with Config.schur_dyn must stay bit-identical to the
    XLA engine — P, Q, rank and in-place layout — including on a
    rank-deficient input (dynamic r0 lags the panel index)."""
    from m4ri_tpu.models.ple import block_factor
    from m4ri_tpu.utils import config as cfgmod
    a = random_dense(rng, 320, 8192)
    a[100:200] = 0
    A = m4.from_numpy(a)
    want = block_factor(A, preserve_l=True, engine="xla")
    monkeypatch.setenv("M4RI_TPU_SCHUR_DYN", "1")
    cfgmod.get_config.cache_clear()
    try:
        assert cfgmod.get_config().schur_dyn
        got = block_factor(A, preserve_l=True, engine="pallas_interpret")
    finally:
        cfgmod.get_config.cache_clear()
    for g, w, what in zip(got, want, ["data", "P", "Q", "rank"]):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                      err_msg=what)


def _mul2_case(rng, m, k, n, tm, tnw, interpret):
    from m4ri_tpu.ops.pallas_mul2 import gf2_mul_pallas_v2
    a = random_dense(rng, m, k)
    b = random_dense(rng, k, n)
    A, B = m4.from_numpy(a), m4.from_numpy(b)
    out = gf2_mul_pallas_v2(A.data, B.data, tm=tm, tnw=tnw,
                            interpret=interpret)
    got = m4.to_numpy(m4.BitMatrix(out, n))
    np.testing.assert_array_equal(got, oracle.mul(a, b),
                                  err_msg=f"{m}x{k}x{n} tm={tm} tnw={tnw}")


@pytest.mark.parametrize("m,k,n,tm,tnw", [
    # multi-chunk contraction (KB = 2), single row tile (I = 1)
    (256, 2048, 4096, 256, 128),
    # I = 1: the drain must not wait a never-started second write-back
    (128, 2048, 4096, 128, 128),
    # multi-tile in every grid dimension, ragged edges + word padding
    (300, 2100, 8200, 128, 128),
    # single-chunk (KB = 1): the first-pass branch covers every tile
    (512, 1000, 4096, 256, 128),
])
def test_pallas_mul2_interpret(rng, m, k, n, tm, tnw):
    _mul2_case(rng, m, k, n, tm, tnw, interpret=True)


@tpu_only
def test_pallas_mul2_tpu(rng):
    _mul2_case(rng, 512, 4096, 4096, 256, 128, interpret=False)


@tpu_only
def test_pallas_mul2_ragged_tpu(rng):
    _mul2_case(rng, 300, 2100, 8200, 256, 128, interpret=False)
