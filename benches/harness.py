"""Statistical benchmark harness (reference analogue: bench/benchmarking.c —
repeat until the mean lies within a +/-accuracy confidence interval at a
chosen confidence level, bounded by min/max counts and max time).

TPU-specific: the dev tunnel adds ~40 ms RPC per dispatch and
``block_until_ready`` can return before execution completes, so (a) timings
force a host readback, and (b) where the workload supports chaining,
``run_marginal`` measures the slope between two chain lengths, cancelling
the fixed per-dispatch cost (what a non-tunneled deployment sees).
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

# z-values for the reference's confidence menu (benchmarking.c:24-52)
_Z = {80: 1.282, 90: 1.645, 95: 1.960, 98: 2.326, 99: 2.576}


@dataclasses.dataclass
class Result:
    mean: float
    std: float
    ci: float
    samples: int

    def line(self, label: str, extra: str = "") -> str:
        return (f"{label}: mean {self.mean:.6f} s, sd {self.std:.6f}, "
                f"ci +/-{self.ci * 100:.1f}%, n={self.samples}{extra}")


def run_timed(fn, *, min_samples: int = 3, max_samples: int = 30,
              accuracy: float = 0.05, confidence: int = 95,
              max_time: float = 120.0) -> Result:
    """Call fn() repeatedly; fn must block until its work is done and return
    nothing (or the value to discard)."""
    z = _Z[confidence]
    times = []
    t_start = time.perf_counter()
    while True:
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
        n = len(times)
        if n >= min_samples:
            m = float(np.mean(times))
            s = float(np.std(times, ddof=1)) if n > 1 else 0.0
            half = z * s / np.sqrt(n) / m if m > 0 else 0.0
            if half <= accuracy or n >= max_samples or \
                    time.perf_counter() - t_start > max_time:
                return Result(m, s, half, n)


def run_marginal(run_chain, lo: int, hi: int, samples: int = 5) -> float:
    """Median slope between chain lengths lo and hi; run_chain(iters) must
    block until done."""
    run_chain(lo)
    run_chain(hi)  # compile + warm

    def t(iters):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run_chain(iters)
            best = min(best, time.perf_counter() - t0)
        return best

    slopes = [(t(hi) - t(lo)) / (hi - lo) for _ in range(samples)]
    return float(np.median(slopes))


# Public TPU v5e peaks used for utilization reporting: 394 int8 TOPS on
# the MXU (each int8 MAC carries one AND+XOR GF(2) term -> 788 effective
# Tbit-op/s ceiling for the parity product) and ~819 GB/s HBM.
V5E_INT8_TOPS = 394e12
V5E_EFF_PEAK_BITOPS = 2 * V5E_INT8_TOPS
V5E_HBM_BYTES_S = 819e9


def xla_counters(jitted_fn, *args, **kwargs):
    """Per-op hardware-counter analogue (reference: PAPI around each
    bench op, bench_multiplication.c:147-158, configure.ac:159-196):
    XLA's compiled cost analysis gives the program's model FLOPs and
    bytes accessed; dividing by the measured wall yields achieved
    bytes/s and MXU utilization, emitted next to the Tbit-op/s."""
    try:
        ca = jitted_fn.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return {"flops": float(ca.get("flops", 0.0)),
                "bytes": float(ca.get("bytes accessed", 0.0))}
    except Exception:
        return {}


def emit(metric: str, value: float, unit: str, wall: float,
         vs_baseline: float | None = None,
         bitops: float | None = None,
         counters: dict | None = None,
         counter_scale: float = 1.0) -> None:
    """One JSON line per program.  ``bitops`` is the effective GF(2)
    bit-operation count of the measured op (2 per AND+XOR term, the
    reference's cc/n^x normalization, bench_multiplication.c:147-158);
    when given, the record reports the achieved Tbit-op/s.  ``counters``
    (from xla_counters, divided by ``counter_scale`` ops per program)
    adds achieved HBM GB/s and MXU utilization."""
    import json
    rec = {"metric": metric, "value": round(value, 4), "unit": unit,
           "wall_s": round(wall, 6)}
    if vs_baseline is not None:
        rec["vs_baseline"] = round(vs_baseline, 3)
    if bitops is not None and wall > 0:
        rec["tbitops"] = round(bitops / wall / 1e12, 3)
    if counters and wall > 0:
        b = counters.get("bytes", 0.0) / max(counter_scale, 1e-12)
        if b:
            rec["hbm_gbytes_s"] = round(b / wall / 1e9, 1)
            rec["hbm_util"] = round(b / wall / V5E_HBM_BYTES_S, 3)
    if unit == "Tbit-op/s" and value > 0:
        rec["mxu_util"] = round(value * 1e12 / V5E_EFF_PEAK_BITOPS, 3)
    elif "tbitops" in rec:
        rec["mxu_util"] = round(
            rec["tbitops"] * 1e12 / V5E_EFF_PEAK_BITOPS, 3)
    print(json.dumps(rec))


def profiled(fn, trace_dir: str | None = None):
    """Wrap ``fn`` with a jax.profiler trace when a directory is given (or
    M4RI_TPU_PROFILE_DIR is set) — the TPU-native analogue of the
    reference's PAPI counter hooks (bench/benchmarking.c)."""
    import os
    trace_dir = trace_dir or os.environ.get("M4RI_TPU_PROFILE_DIR")
    if not trace_dir:
        return fn

    def wrapped(*a, **kw):
        import jax
        with jax.profiler.trace(trace_dir):
            return fn(*a, **kw)

    return wrapped
