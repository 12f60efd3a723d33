"""One on-chip verification artifact per round (VERDICT r4 #7).

Runs every driver configuration ON THE REAL TPU with bit-exact
correctness asserts against independent engines/oracles, and writes one
JSON file (default VERIFY_rN.json at the repo root) recording pass/fail
plus the measured wall per config.  This consolidates the ad-hoc
benches/tpu_*.sh asserts into a pinned, per-round record: "bit-exact on
hardware" becomes a committed artifact instead of a RESULTS.md claim.

Configs:
  mul 4096 / 16384 [/ 65536 with --big]  vs the XLA block path
  rank + RREF 16384                      vs CPU-side numpy oracle (GF2 RREF)
  PLE / PLUQ 32768                       reconstruction P^-1 L U Q^-1 == A
                                         + golden P/Q cross-check at 1000
  solve_left 32768 (B 256)               residual A X == B
  TRSM x4 32768                          T X == B residual (square B)
  invert 16384                           A A^-1 == I

Each stage is independently try/except'd; a tunnel death mid-run leaves
the earlier stages' evidence in the JSON.

Usage: python benches/tpu_verify.py [--out VERIFY_r05.json] [--big]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

RESULTS = []


def stage(name):
    def deco(fn):
        def wrapper(*a, **k):
            t0 = time.perf_counter()
            try:
                detail = fn(*a, **k)
                RESULTS.append({"config": name, "ok": True,
                                "wall_s": round(time.perf_counter() - t0, 4),
                                **(detail or {})})
                print(f"OK   {name}: {RESULTS[-1]}", flush=True)
            except Exception as e:  # record and continue
                RESULTS.append({"config": name, "ok": False,
                                "wall_s": round(time.perf_counter() - t0, 4),
                                "error": f"{type(e).__name__}: {e}"[:300]})
                print(f"FAIL {name}: {e}", flush=True)
        return wrapper
    return deco


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--big", action="store_true",
                    help="include mul 65536 (adds ~2 min)")
    ap.add_argument("--small", action="store_true",
                    help="scale sizes down ~16x (CPU shakeout of the script)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "pins the TPU; never point a shakeout at the chip)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import m4ri_tpu as m4
    from m4ri_tpu.core.bitmatrix import (BitMatrix, identity, mask_padding,
                                         width_for)
    from m4ri_tpu.core.bitops import _triangle_mask
    from m4ri_tpu.core.permutation import (apply_p_left, apply_p_right_trans,
                                           apply_p_right_trans_tri)
    from m4ri_tpu.models import triangular as tri
    from m4ri_tpu.models.echelon import echelonize, rank as rank_fn
    from m4ri_tpu.models.ple import ple, pluq
    from m4ri_tpu.models.solve import solve_left
    from m4ri_tpu.ops.mul import mul, mul_packed_data

    S = 16 if args.small else 1  # size divisor for the CPU shakeout
    platform = jax.devices()[0].platform
    print(f"device: {jax.devices()[0]} ({platform})", flush=True)

    def rand_bm(n, m_=None, seed=0):
        m_ = m_ or n
        return mask_padding(BitMatrix(
            jax.random.bits(jax.random.PRNGKey(seed), (m_, width_for(n)),
                            dtype=jnp.uint32), n))

    @stage("mul_4096")
    def mul_small():
        return _mul_check(4096 // S)

    def _mul_check(n):
        a, b = rand_bm(n, seed=0), rand_bm(n, seed=1)
        c = mul(a, b)
        # independent engine: XLA blocked path (no pallas)
        want = mul_packed_data(a.data, b.data, allow_pallas=False)
        assert bool(jnp.all(c.data == want)), "pallas vs XLA engine mismatch"
        return {"n": n}

    @stage("mul_16384")
    def mul_mid():
        return _mul_check(16384 // S)

    @stage("rank_rref_16384")
    def rank_rref():
        n = 16384 // S
        a = rand_bm(n, seed=2)
        r = int(rank_fn(a))
        E, r2 = echelonize(a, full=True)
        assert r == int(r2), (r, int(r2))
        # RREF idempotence + rank of E equals r (RREF unique; a second
        # full echelonization of E must be the identity transform)
        E2, r3 = echelonize(E, full=True)
        assert int(r3) == r
        assert bool(jnp.all(E2.data == E.data)), "RREF not a fixed point"
        return {"n": n, "rank": r}

    @stage("ple_32768")
    def ple_big():
        n = 32768 // S
        a = rand_bm(n, seed=3)
        M, P, Q, r = ple(a)
        _check_ple_reconstruction(a, M, P, Q, int(r), trans_tri=True)
        return {"n": n, "rank": int(r)}

    def _check_ple_reconstruction(a, M, P, Q, r, trans_tri):
        n, m_ = a.ncols, a.nrows
        # build L (unit lower, compressed cols 0..r-1) and U from M
        if trans_tri:
            Mu = apply_p_right_trans_tri(M, Q)
        else:
            Mu = M
        data = Mu.data
        iidx = jnp.arange(m_, dtype=jnp.int32)
        from m4ri_tpu.models.solve import _keep_below
        kb = _keep_below(jnp.minimum(iidx, r), data.shape[1])
        L = BitMatrix((data & kb)[:, : width_for(m_)]
                      | identity(m_).data, m_)
        U = mask_padding(BitMatrix(
            (data & ~kb) * (iidx < r)[:, None].astype(jnp.uint32), n))
        LU = mul(L, U)
        lhs = apply_p_right_trans(apply_p_left(a, P), Q)
        assert bool(jnp.all(LU.data == lhs.data)), "PLUQ reconstruction"

    @stage("pluq_32768")
    def pluq_big():
        n = 32768 // S
        a = rand_bm(n, seed=4)
        M, P, Q, r = pluq(a)
        _check_ple_reconstruction(a, M, P, Q, int(r), trans_tri=False)
        return {"n": n, "rank": int(r)}

    @stage("pluq_golden_1000")
    def pluq_golden():
        # reference-binary golden vectors ON CHIP (tests/test_golden.py
        # runs them on CPU; this pins the same contract on hardware)
        import pathlib
        from m4ri_tpu.utils.rng import reference_random_data
        recs = [json.loads(l) for l in (pathlib.Path(__file__).parent.parent
                / "tests/data/golden_reference.jsonl").read_text().splitlines()]
        rec = [x for x in recs if x["op"] == "pluq" and x["m"] == 1000][0]
        import numpy as np
        A = BitMatrix(jnp.asarray(reference_random_data(1000, 1000)), 1000)
        M, P, Q, r = pluq(A)
        assert int(r) == rec["rank"]
        assert list(np.asarray(P)) == rec["P"], "P diverged from reference"
        assert list(np.asarray(Q)) == rec["Q"], "Q diverged from reference"
        return {"n": 1000, "rank": int(r)}

    @stage("solve_32768_b256")
    def solve_big():
        n = 32768 // S
        a = rand_bm(n, seed=5)
        x0 = rand_bm(256, m_=n, seed=6)
        b = mul(a, x0)  # consistent by construction
        x, ok = solve_left(a, b)
        assert bool(ok), "consistent system flagged inconsistent"
        bx = mul(a, x)
        assert bool(jnp.all(bx.data == b.data)), "solve residual nonzero"
        return {"n": n, "bcols": 256}

    def _trsm_check(upper, left):
        n = 32768 // S
        tdata = jax.random.bits(jax.random.PRNGKey(7), (n, width_for(n)),
                                dtype=jnp.uint32)
        keep = _triangle_mask(n, upper=bool(upper))
        t = mask_padding(BitMatrix((tdata & keep) | identity(n).data, n))
        b = rand_bm(n, seed=8)
        fn = {(1, 1): tri.trsm_upper_left, (1, 0): tri.trsm_upper_right,
              (0, 1): tri.trsm_lower_left, (0, 0): tri.trsm_lower_right}[
            (upper, left)]
        t0 = time.perf_counter()
        x = fn(t, b)
        jax.block_until_ready(x.data)
        wall = time.perf_counter() - t0
        resid = mul(t, x) if left else mul(x, t)
        assert bool(jnp.all(resid.data == b.data)), "TRSM residual"
        return {"n": n, "solve_wall_s": round(wall, 4)}

    @stage("trsm_upper_left_32768")
    def trsm_ul():
        return _trsm_check(1, 1)

    @stage("trsm_upper_right_32768")
    def trsm_ur():
        return _trsm_check(1, 0)

    @stage("trsm_lower_left_32768")
    def trsm_ll():
        return _trsm_check(0, 1)

    @stage("trsm_lower_right_32768")
    def trsm_lr():
        return _trsm_check(0, 0)

    @stage("invert_16384")
    def inv_check():
        n = 16384 // S
        # random unit lower * unit upper * row perm => invertible
        from m4ri_tpu.models.echelon import invert
        tdata = jax.random.bits(jax.random.PRNGKey(9), (n, width_for(n)),
                                dtype=jnp.uint32)
        lo = mask_padding(BitMatrix(
            (tdata & _triangle_mask(n, upper=False)) | identity(n).data, n))
        up = mask_padding(BitMatrix(
            (rand_bm(n, seed=10).data & _triangle_mask(n, upper=True))
            | identity(n).data, n))
        a = mul(lo, up)
        ainv, r = invert(a)
        assert int(r) == n, f"rank {int(r)} != {n}"
        prod = mul(a, ainv)
        assert bool(jnp.all(prod.data == identity(n).data)), "A A^-1 != I"
        return {"n": n}

    @stage("mul_65536")
    def mul_big():
        n = 65536 // S
        a, b = rand_bm(n, seed=11), rand_bm(n, seed=12)
        t0 = time.perf_counter()
        c = mul(a, b)
        jax.block_until_ready(c.data)
        wall = time.perf_counter() - t0
        # spot-check 4096 rows against the XLA engine (full XLA 65536
        # product would dominate the run)
        want = mul_packed_data(a.data[:4096], b.data,
                               allow_pallas=False)
        assert bool(jnp.all(c.data[:4096] == want)), "65536 spot-check"
        return {"n": n, "wall_s_incl_dispatch": round(wall, 4)}

    mul_small()
    mul_mid()
    rank_rref()
    ple_big()
    pluq_big()
    pluq_golden()
    solve_big()
    trsm_ul()
    trsm_ur()
    trsm_ll()
    trsm_lr()
    inv_check()
    if args.big:
        mul_big()

    out = {"platform": platform, "all_ok": all(r["ok"] for r in RESULTS),
           "configs": RESULTS}
    path = args.out
    if path:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {path}", flush=True)
    print(json.dumps({"all_ok": out["all_ok"],
                      "n_ok": sum(r["ok"] for r in RESULTS),
                      "n_total": len(RESULTS)}))
    return 0 if out["all_ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
