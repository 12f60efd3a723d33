"""Hardware-derived tuning configuration.

The reference library derives every algorithmic cutoff from CPU cache sizes
detected at configure time (reference: configure.ac:198-219 writes the
detected L1/L2/L3 into m4ri_config.h, and misc.h:569-599 / strassen.h:133-135
/ ple.h:40 turn them into cutoffs).  Here ``get_config()`` inspects the JAX
backend once — platform, device kind, HBM size — and derives the analogous
knobs: MXU block sizes bounding the unpacked/int32 intermediates in HBM,
panel/window sizes for the factorization, Strassen crossover, and whether
the Pallas kernels are available.  Every field can be overridden with an
``M4RI_TPU_<FIELD>`` environment variable (the reference analogue of
re-running configure with explicit cache sizes).

All sizes are in *bits* (matrix dimensions) unless noted.
"""

from __future__ import annotations

import dataclasses
import functools
import os

WORD_BITS = 32  # TPU vector lanes are 32-bit; reference uses 64 (misc.h:87).


@dataclasses.dataclass(frozen=True)
class Config:
    # Panel width for blocked PLE / echelonization (reference analogue:
    # kk = 6*k Gray-code round width, brilliantrussian.c:642-647).
    # 512 measured best on v5e after the shifted-cw pivot-kernel rewrite
    # halved the per-column cost (PLE 32768: 0.197 s vs 0.227 at 256;
    # 16384: 0.072 vs 0.073); before the rewrite the taller window made
    # 512 lose (0.107 vs 0.085 at 16384).
    panel_width: int = 512
    # At large n the deeper Schur contraction and halved panel count win:
    # tune_panel 32768 (round 5): nb=1024/W=1088 0.1570 s vs 512/576
    # 0.1649; at 16384 the order flips (0.0698 vs 0.0603), so the wide
    # panel engages only at min-dim >= panel_width_big_min.
    panel_width_big: int = 1024
    panel_window_big: int = 1088
    panel_width_big_min: int = 32768
    # Block size for the MXU matmul k-dimension when the operands are too
    # large to unpack at once (reference analogue: __M4RI_MUL_BLOCKSIZE,
    # mzd.h:59 — babystep/giantstep blocking to keep tables L2 resident).
    mul_block_k: int = 8192
    # Row-block size bounding the int32 product intermediate in HBM.
    mul_block_m: int = 8192
    # Below this dimension, use one fused matmul with no blocking.
    mul_block_threshold: int = 8192
    # Strassen-Winograd crossover (reference: __M4RI_STRASSEN_MUL_CUTOFF =
    # MIN(sqrt(4*L3), 4096), strassen.h:133-135).  On the MXU the base
    # multiply is so fast that Strassen only pays off for large n.
    strassen_cutoff: int = 8192
    # dtype used for the unpacked MXU operands: "int8" (2x rate on v5e) or
    # "bfloat16" (exact for k <= 2**24 with f32 accumulation).
    mxu_dtype: str = "int8"
    # Density crossover at which M4RI echelonization switches to PLUQ
    # (reference: echelonform.h:37, threshold 0.15).
    echelon_density_crossover: float = 0.15
    # Route shallow-k products (k <= 1024, large m/n) through the fused
    # Pallas kernel on TPU (avoids the HBM int32-product materialization).
    use_pallas_schur: bool = True
    # Route large deep products through the fused Pallas kernel on TPU
    # (measured: 375 vs 353 Tbit-op/s vs blocked XLA at n=16384, and no
    # unpacked-operand HBM materialization).
    use_pallas_big: bool = True
    # Smallest max-dimension at which the fused kernel beats XLA's single
    # fused dot (measured on v5e at n=4096: 386 vs 276 Tbit-op/s; below
    # ~2048 XLA keeps everything VMEM-resident and wins decisively).
    pallas_big_min: int = 4096
    # Strassen recursion depth cap (compile size grows 7^levels).
    strassen_max_levels: int = 2
    # A third level engages at min-dim >= this (round 5, donated-carry
    # chain slopes at 65536: depth 3 = 970 vs depth 2 = 886 Tbit-op/s;
    # the round-3 OOM was the non-donated two-product chain, fixed by
    # jax buffer donation in the callers that chain big products).  At
    # 32768 depth 2 already wins (377 vs 298 direct) and depth 3's
    # smaller 4096 base loses its kernel efficiency, so keep 65536.
    strassen_depth3_min: int = 65536
    # dtype of the unpacked operands inside the fused Pallas mul kernels.
    # v5e's MXU runs int4 at ~2.2x the int8 rate (measured 820 vs 370
    # Top/s, benches/probe_int4.py), and the GF(2) operands are 0/1 with
    # exact int32 accumulation either way — int4 is bit-exact and ~40%
    # faster end-to-end (v1: 390 vs 280 Tbit-op/s at n=4096).
    pallas_op_dtype: str = "int4"
    # Route deep contractions (more than two 1024-bit chunks) through the
    # v2 kernel (ops/pallas_mul2.py), which unpacks each B chunk once per
    # column group instead of once per row tile: measured 617 vs 280
    # Tbit-op/s at n=4096 with int4 (benches/probe_mul2.py).
    use_pallas_v2: bool = True
    # Panels per aggregated block in the PLE sweep (reference analogue:
    # the PLE recursion updating only the trailing quadrant,
    # ple.c:122-127).  Per-panel Schur updates touch only the current
    # block's column slab; one deep aggregated update per block carries
    # the trailing columns at the deep-contraction kernel rate.
    # Measured at 32768 the flat sweep still wins (0.279 s vs 0.313 s at
    # the best block size — the per-panel correction products and slab
    # copies outweigh the rate gain), so the default stays 1 (flat,
    # full-width per-panel updates); the blocked path is bit-identical
    # and available via M4RI_TPU_PLE_BLOCK_PANELS for larger n.
    ple_block_panels: int = 1
    # dtype inside the fused Schur-update kernel (the panel
    # factorization's k = panel-width products).  At the old nb=256 the
    # shallow contraction was unpack-bound and int4 lost slightly
    # (PLE 32768: 0.287 s int4 vs 0.279 int8); at the nb=512 default the
    # k=512-deep update is MXU-bound and int4 wins (0.166 vs 0.195,
    # bit-exact vs the XLA engine on chip) — int4 by default.
    schur_op_dtype: str = "int4"
    # Run the panel pivot loop as a single VMEM-resident Mosaic kernel on
    # TPU (ops/pallas_panel.py) — the XLA lowering pays a ~2 us/column
    # fori_loop floor that dominates large factorizations.
    use_pallas_panel: bool = True
    # Row-window height for the panel factorization's sequential pivot loop
    # (models/ple.py).  The canonical pivot always lies in the first
    # `window` active rows unless the window goes rank-deficient, which is
    # detected exactly and falls back to a full-height panel sweep; a
    # 64-row margin over the panel width keeps the serial loop minimal
    # (per-column cost is proportional to the window height: rank 16384
    # 0.0586 s at W=576 vs 0.0614 at 768) while making the fallback
    # vanishingly rare for generic inputs — and exact when it does fire.
    panel_window: int = 576
    # Split the panel sweep into column-tile groups so the fused Schur
    # kernel statically skips streaming the already-factored tiles
    # (ops/pallas_schur.py col_tile_skip).  Costs one scan body per group
    # at compile time; disable if a remote-compile environment chokes.
    schur_col_skip: bool = True
    # Fully-dynamic Schur tile skipping (ops/pallas_schur.py
    # gf2_schur_update_dyn): one hand-pipelined kernel instance whose
    # runtime (r0, c0w) bounds skip BOTH the rows above the rank and the
    # already-factored column tiles — supersedes schur_col_skip when on.
    # Default off until hardware-measured (interpret-validated only; the
    # round-3 tunnel outage blocked the TPU ablation).
    schur_dyn: bool = False
    # Fuse the below-window panel elimination (lam / v / miss chain) into
    # one row-tiled Mosaic pass (ops/pallas_post.py) instead of the XLA
    # unpack-dot-pack chain, whose m x nb intermediates get layout-copied
    # inside the factorization scan.
    use_pallas_panel_post: bool = True
    # Row count below which the XLA post chain replaces the fused kernel.
    # At the nb=256 panel width the fused kernel's narrow (tm, 8-word)
    # blocks ran at ~1/16 lane efficiency and lost below ~25k rows
    # (measured 16384: 0.0838 s XLA vs 0.0886 fused); at the current
    # nb=512 default the fused kernel wins at every driver size
    # (16384: 0.0704 vs 0.0718), so the gate is off by default.
    pallas_post_min_rows: int = 0
    # Provenance of the derived values ("tpu:<kind>", "cpu", "default").
    derived_from: str = "default"


def _env_overrides(cfg: Config) -> Config:
    updates = {}
    for f in dataclasses.fields(Config):
        raw = os.environ.get(f"M4RI_TPU_{f.name.upper()}")
        if raw is None:
            continue
        if f.type in ("int", int):
            updates[f.name] = int(raw)
        elif f.type in ("bool", bool):
            updates[f.name] = raw.lower() in ("1", "true", "yes", "on")
        elif f.type in ("float", float):
            updates[f.name] = float(raw)
        else:
            updates[f.name] = raw
    return dataclasses.replace(cfg, **updates) if updates else cfg


def _derive() -> Config:
    """Inspect the backend (reference analogue: configure-time cache
    detection) and pick block sizes so the blocked XLA path's transient
    int32 product (mul_block_m x mul_block_k x 4 B) plus unpacked operands
    stay a small fraction of device memory."""
    try:
        import jax
        backend = jax.default_backend()
        dev = jax.devices()[0]
        kind = getattr(dev, "device_kind", backend) or backend
    except Exception:  # pragma: no cover - no backend at all
        return Config()
    if backend == "tpu":
        hbm = None
        try:
            stats = dev.memory_stats()
            hbm = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        except Exception:
            pass
        hbm = hbm or 16 * 1024**3
        # one unpacked int8 row block (bm x bk) + int32 partial product
        # (bm x n/32 words) should use well under a quarter of HBM
        blk = 8192 if hbm >= 12 * 1024**3 else 4096
        return Config(mul_block_k=blk, mul_block_m=blk,
                      mul_block_threshold=blk, strassen_cutoff=blk,
                      derived_from=f"tpu:{kind}")
    # CPU (tests / fallback): no Mosaic, smaller fused products
    return Config(use_pallas_schur=False, use_pallas_big=False,
                  use_pallas_panel=False, mul_block_k=4096, mul_block_m=4096,
                  mul_block_threshold=4096, strassen_cutoff=4096,
                  derived_from="cpu")


@functools.lru_cache(maxsize=1)
def get_config() -> Config:
    return _env_overrides(_derive())
