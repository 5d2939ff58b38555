#!/usr/bin/env python
"""TPU A/B: rank-2 reciprocal fold vs rank-1 int8-direct vs f32 (VERDICT r3
item 6 — the measured bank-or-close decision).

Accuracy side (measured on CPU/f64, pinned by tests/test_int8direct.py::
TestNumerics::test_rank2_fold_recovers_structured_backgrounds): on
STRUCTURED non-rank-1 backgrounds (two-component source, row-dependent
mixing) the rank-1 fold degrades to multiple dB of display error while
rank-2 (top-2 SVD of 1/bg, two quantized operator pairs) restores
display-grade accuracy (0.39 dB max at the flagship shape).  Full-rank
NOISE deviations are unhelped by any low-rank fold (equal residuals).

This harness measures the SPEED side: 4 s8 matmuls vs 2 vs the f32 pair,
interleaved in one chip-load window (honest differenced-scan timing,
bench.py docstring).
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

ROWS, COLS, NFFT, NDISP, BATCH = 512, 2048, 2048, 512, 8
G1, G2 = 64, 256
REPEATS = 6


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fdoct_tpu.calibration import Calibration
    from fdoct_tpu.config import PipelineConfig
    from fdoct_tpu.int8direct import Int8DirectPlan, reconstruct_int8_direct
    from fdoct_tpu.pipeline import form_bscan, reconstruct

    print(f"devices: {jax.devices()}", flush=True)
    cfg = PipelineConfig(
        width=COLS, height=ROWS, binvalue=1, averages=BATCH,
        numfftpoints=NFFT, numdisplaypoints=NDISP,
        lambdamin=816e-9, lambdamax=884e-9, dtype="float32", compat=True)
    calib = Calibration.create(cfg)

    rng = np.random.default_rng(0)
    lam = np.linspace(0, 1, COLS)
    spec1 = np.exp(-(((lam - 0.45) / 0.15) ** 2)) * 180.0 + 12.0
    spec2 = np.exp(-(((lam - 0.65) / 0.08) ** 2)) * 120.0
    g1 = 1.0 + 0.05 * np.sin(np.linspace(0, 3, ROWS))
    g2 = np.linspace(0.0, 1.0, ROWS)
    bg_np = np.maximum(
        (g1[:, None] * spec1[None, :] + 0.2 * g2[:, None] * spec2[None, :])
        * (1 + 0.003 * rng.standard_normal((ROWS, COLS))), 1.0)
    p1 = Int8DirectPlan.create(calib, cfg, bg_np, np.zeros((ROWS, COLS)))
    p2 = Int8DirectPlan.create(calib, cfg, bg_np, np.zeros((ROWS, COLS)),
                               rank=2)
    print(f"fold residual: rank-1 {float(p1.bg_rank1_resid):.4f}, "
          f"rank-2 {float(p2.bg_rank1_resid):.4f}", flush=True)
    bg = jnp.asarray(bg_np, jnp.float32)
    pi = jnp.zeros((ROWS, COLS), jnp.float32)

    from bench_common import interleaved_measure, make_generators, scan_of
    gen_s8, gen_u8 = make_generators(BATCH, ROWS, COLS)

    disp = lambda m: form_bscan(m, cfg, averages=BATCH).bscandisp \
        .astype(jnp.float32)  # noqa: E731
    variants = [
        ("f32_disp", scan_of(lambda fr: disp(
            reconstruct(fr, bg, pi, calib, cfg, "fused").sum(axis=0))),
         gen_u8),
        ("i8_rank1_disp", scan_of(lambda fr: disp(
            reconstruct_int8_direct(fr, p1).sum(axis=0))), gen_s8),
        ("i8_rank2_disp", scan_of(lambda fr: disp(
            reconstruct_int8_direct(fr, p2).sum(axis=0))), gen_s8),
    ]

    pers = interleaved_measure(variants, G1, G2, REPEATS, BATCH, ROWS)
    if any(v is None for v in pers.values()):
        print("window unusable; rerun for trustworthy ratios", flush=True)
        return

    print(f"\nrank-2 vs f32: {pers['f32_disp']/pers['i8_rank2_disp']:.3f}x  "
          f"rank-1 vs f32: {pers['f32_disp']/pers['i8_rank1_disp']:.3f}x  "
          f"rank-2 cost vs rank-1: "
          f"{pers['i8_rank2_disp']/pers['i8_rank1_disp']:.3f}x", flush=True)


if __name__ == "__main__":
    main()
