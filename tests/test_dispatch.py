"""Production dispatch-seam coverage (VERDICT round-1 weak #4).

The reference deliberately straddles its cutoffs (test_ple.c:142-148); here
every branch of mul_packed_data's dispatch (fused XLA / blocked XLA /
Pallas shallow-k / Pallas big) and the Strassen engagement seam execute
under shrunken Config thresholds, with a spy asserting *which* path ran.
The Pallas branches run under the interpreter on CPU."""

import numpy as np
import pytest

import m4ri_tpu as m4
from m4ri_tpu.utils.config import Config

import oracle
from conftest import random_dense


def _spy_pallas(monkeypatch, calls):
    from m4ri_tpu.ops import mul as mulmod
    from m4ri_tpu.ops import pallas_mul, pallas_mul2

    real = pallas_mul.gf2_mul_pallas
    real2 = pallas_mul2.gf2_mul_pallas_v2

    def spy(a, b, **kw):
        calls.append(("pallas", a.shape, b.shape))
        kw["interpret"] = True
        return real(a, b, **kw)

    def spy2(a, b, **kw):
        calls.append(("pallas_v2", a.shape, b.shape))
        kw["interpret"] = True
        return real2(a, b, **kw)

    monkeypatch.setattr(pallas_mul, "gf2_mul_pallas", spy)
    monkeypatch.setattr(pallas_mul2, "gf2_mul_pallas_v2", spy2)
    # the dispatch gates on the backend; pretend we are on TPU (the spy
    # forces interpret mode so the kernel still runs on CPU)
    monkeypatch.setattr(mulmod.jax, "default_backend", lambda: "tpu")
    return calls


def _check(a_np, b_np, cfg, expect_pallas, monkeypatch):
    from m4ri_tpu.ops.mul import mul_packed_data
    calls = _spy_pallas(monkeypatch, [])
    A, B = m4.from_numpy(a_np), m4.from_numpy(b_np)
    out = mul_packed_data(A.data, B.data, cfg=cfg)
    got = m4.to_numpy(m4.BitMatrix(out, b_np.shape[1]))
    np.testing.assert_array_equal(got, oracle.mul(a_np, b_np))
    assert (len(calls) > 0) == expect_pallas, calls


def test_dispatch_pallas_shallow_k(rng, monkeypatch):
    """kw <= 32, m >= 2048, nw >= 128: the Schur-update shape must route
    through the fused kernel."""
    cfg = Config()
    a = random_dense(rng, 2048, 64)
    b = random_dense(rng, 64, 4096)
    _check(a, b, cfg, True, monkeypatch)


def test_dispatch_pallas_big_deep(rng, monkeypatch):
    """Deep contraction above mul_block_threshold routes to the v2 kernel
    (more than one chunk at the tkw=64 default: unpack-B-once engine)."""
    cfg = Config(mul_block_threshold=1024, pallas_big_min=1024)
    a = random_dense(rng, 2048, 2080)
    b = random_dense(rng, 2080, 4096)
    calls = _spy_pallas(monkeypatch, [])
    from m4ri_tpu.ops.mul import mul_packed_data
    A, B = m4.from_numpy(a), m4.from_numpy(b)
    out = mul_packed_data(A.data, B.data, cfg=cfg)
    got = m4.to_numpy(m4.BitMatrix(out, b.shape[1]))
    np.testing.assert_array_equal(got, oracle.mul(a, b))
    assert calls and calls[0][0] == "pallas_v2", calls


def test_dispatch_pallas_big_single_chunk(rng, monkeypatch):
    """A deep-dispatch product whose contraction fits one chunk stays on
    v1 (nothing to re-unpack; v2 would add C read-modify-write traffic).
    kw=2048/32=64 words sits exactly at the single-tkw=64-chunk gate."""
    # use_pallas_schur off so the big branch (not the shallow-k one)
    # handles this single-chunk contraction
    cfg = Config(mul_block_threshold=512, pallas_big_min=1024,
                 use_pallas_schur=False)
    a = random_dense(rng, 2048, 2048)
    b = random_dense(rng, 2048, 4096)
    calls = _spy_pallas(monkeypatch, [])
    from m4ri_tpu.ops.mul import mul_packed_data
    A, B = m4.from_numpy(a), m4.from_numpy(b)
    out = mul_packed_data(A.data, B.data, cfg=cfg)
    got = m4.to_numpy(m4.BitMatrix(out, b.shape[1]))
    np.testing.assert_array_equal(got, oracle.mul(a, b))
    assert calls and calls[0][0] == "pallas", calls


def test_dispatch_fused_below_threshold(rng, monkeypatch):
    """Small products stay on the single fused XLA dot."""
    cfg = Config()
    a = random_dense(rng, 200, 130)
    b = random_dense(rng, 130, 170)
    _check(a, b, cfg, False, monkeypatch)


def test_dispatch_blocked_xla(rng, monkeypatch):
    """Above-threshold with the Pallas routes disabled: the depth/row
    blocked XLA path (partial-parity XOR combining)."""
    cfg = Config(mul_block_threshold=64, mul_block_m=64, mul_block_k=64,
                 use_pallas_schur=False, use_pallas_big=False)
    a = random_dense(rng, 100, 200)
    b = random_dense(rng, 200, 90)
    _check(a, b, cfg, False, monkeypatch)


def test_dispatch_threshold_straddle(rng, monkeypatch):
    """One word below / at / above mul_block_threshold, all bit-exact
    (reference discipline: test_ple.c straddles __M4RI_PLE_CUTOFF)."""
    for n in (96, 128, 160):
        cfg = Config(mul_block_threshold=128, mul_block_m=64, mul_block_k=64,
                     use_pallas_schur=False, use_pallas_big=False)
        a = random_dense(rng, n, n)
        b = random_dense(rng, n, n)
        _check(a, b, cfg, False, monkeypatch)


def test_strassen_engagement_seam(rng, monkeypatch):
    """mul() must engage Strassen exactly at 2*cutoff and stay bit-exact
    on both sides of the seam."""
    from m4ri_tpu.ops import mul as mulmod
    from m4ri_tpu.ops import strassen as strmod
    small = Config(strassen_cutoff=64, strassen_max_levels=2)
    monkeypatch.setattr(mulmod, "get_config", lambda: small)
    monkeypatch.setattr(strmod, "get_config", lambda: small)
    rec_calls = []
    real_rec = strmod._mul_rec

    def spy(a, b, depth):
        rec_calls.append(depth)
        return real_rec(a, b, depth)

    monkeypatch.setattr(strmod, "_mul_rec", spy)
    for n, engaged in [(127, False), (128, True), (256, True)]:
        rec_calls.clear()
        a = random_dense(rng, n, n)
        b = random_dense(rng, n, n)
        got = m4.to_numpy(mulmod.mul(m4.from_numpy(a), m4.from_numpy(b)))
        np.testing.assert_array_equal(got, oracle.mul(a, b))
        assert (len(rec_calls) > 0) == engaged, (n, rec_calls)


def test_panel_window_seam(rng):
    """Factorizations with window exactly nb, nb + 1 row block, and full
    height agree bit for bit (the window/fallback dispatch seam)."""
    from m4ri_tpu.models.ple import block_factor
    a = random_dense(rng, 200, 96)
    a[:70] = 0
    A = m4.from_numpy(a)
    outs = []
    for w in (32, 64, 224):
        outs.append(block_factor(A, preserve_l=True, nb=32, window=w,
                                 engine="xla"))
    for got in outs[1:]:
        for g, w_, what in zip(got, outs[0], ["data", "P", "Q", "rank"]):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w_),
                                          err_msg=what)
