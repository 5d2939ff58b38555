#!/usr/bin/env python
"""TPU A/B: display-epilogue fusion (VERDICT r3 item 2).

The int8-direct scan shape was bounded by a ~5-launch display epilogue
(bench_display_stages: transpose, dB chain, TWO global min/max reductions,
normalize+u8) costing 30-40% of the banked int8 multiplier.  form_bscan now
runs the chain untransposed with a one-pass variadic (min,max) reduce so the
whole epilogue collapses to ~2 kernels (pipeline.form_bscan, ops.minmax_pair).

This harness interleaves, in ONE run (same chip-load window):
  A  recon-only int8 scan      — the ceiling (no display at all)
  B  OLD epilogue int8 scan    — transposed-first, separate min/max
  C  NEW epilogue int8 scan    — the shipped form_bscan
and the same B/C pair for the f32 headline shape.  Success criterion from
the verdict: display-inclusive >= 75% of reconstruct-only (was ~65%).

Honest-timing rules (bench.py docstring): scalar-fetch completion,
differenced scan lengths, on-device frame generation.
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
    from fdoct_tpu.ops import (normalize_minmax, threshold_floor, to_db,
                               to_uint8)
    from fdoct_tpu.ops.scale import mask_dc_rows
    from fdoct_tpu.pipeline import form_bscan, reconstruct

    print(f"devices: {jax.devices()}", flush=True)
    cfg = PipelineConfig(
        width=COLS, height=ROWS, binvalue=1, averages=BATCH,
        numfftpoints=NFFT, numdisplaypoints=NDISP,
        lambdamin=816e-9, lambdamax=884e-9, dtype="float32", compat=True)
    calib = Calibration.create(cfg)

    rng = np.random.default_rng(0)
    lam = np.linspace(0, 1, COLS)
    spec = np.exp(-(((lam - 0.5) / 0.18) ** 2)) * 180.0 + 12.0
    gain = 1.0 + 0.05 * np.sin(np.linspace(0, 3, ROWS))
    bg_np = gain[:, None] * spec[None, :] * (
        1 + 0.003 * rng.standard_normal((ROWS, COLS)))
    plan = Int8DirectPlan.create(calib, cfg, bg_np, np.zeros((ROWS, COLS)))
    bg = jnp.full((ROWS, COLS), 128.0, jnp.float32)
    pi = jnp.zeros((ROWS, COLS), jnp.float32)

    def old_epilogue(mag_sum):
        """The round-3 form_bscan formulation: transpose first, separate
        min/max reductions (kept here verbatim as the A/B baseline)."""
        bscan = mag_sum.T / BATCH + 1e-5
        db = to_db(bscan, eps=0.0, compat=cfg.compat)
        db = mask_dc_rows(db)
        disp = threshold_floor(db, cfg.bscanthreshold)
        return to_uint8(normalize_minmax(disp, 0.0, 1.0))

    from bench_common import interleaved_measure, make_generators, scan_of
    gen_s8, gen_u8 = make_generators(BATCH, ROWS, COLS)

    i8_recon = scan_of(lambda fr: reconstruct_int8_direct(fr, plan)
                       .sum(axis=0))
    i8_old = scan_of(lambda fr: old_epilogue(
        reconstruct_int8_direct(fr, plan).sum(axis=0)).astype(jnp.float32))
    i8_new = scan_of(lambda fr: form_bscan(
        reconstruct_int8_direct(fr, plan).sum(axis=0), cfg,
        averages=BATCH).bscandisp.astype(jnp.float32))

    from fdoct_tpu.int8direct import reconstruct_bscan_int8_fused
    i8_pallas = scan_of(lambda fr: reconstruct_bscan_int8_fused(
        fr, plan, cfg.bscanthreshold, averages=BATCH,
        compat=cfg.compat)[1].astype(jnp.float32))

    f32_old = scan_of(lambda fr: old_epilogue(
        reconstruct(fr, bg, pi, calib, cfg, "fused").sum(axis=0))
        .astype(jnp.float32))
    f32_new = scan_of(lambda fr: form_bscan(
        reconstruct(fr, bg, pi, calib, cfg, "fused").sum(axis=0), cfg,
        averages=BATCH).bscandisp.astype(jnp.float32))

    variants = [("i8_recon_only", i8_recon, gen_s8),
                ("i8_disp_OLD", i8_old, gen_s8),
                ("i8_disp_NEW", i8_new, gen_s8),
                ("i8_disp_PALLAS", i8_pallas, gen_s8),
                ("f32_disp_OLD", f32_old, gen_u8),
                ("f32_disp_NEW", f32_new, gen_u8)]

    r = interleaved_measure(variants, G1, G2, REPEATS, BATCH, ROWS)

    def ratio(num, den, scale=1.0, unit="x"):
        if r.get(num) is None or r.get(den) is None:
            return "n/a (window unusable)"
        return f"{r[num] / r[den] * scale:.3f}{unit}"

    print(f"\nint8 display-inclusive/recon-only: "
          f"OLD {ratio('i8_recon_only', 'i8_disp_OLD', 100, '%')}  "
          f"NEW {ratio('i8_recon_only', 'i8_disp_NEW', 100, '%')}  "
          f"PALLAS {ratio('i8_recon_only', 'i8_disp_PALLAS', 100, '%')}  "
          f"(goal >= 75%)", flush=True)
    print(f"epilogue speedup: int8 {ratio('i8_disp_OLD', 'i8_disp_NEW')}, "
          f"pallas {ratio('i8_disp_OLD', 'i8_disp_PALLAS')}, "
          f"f32 {ratio('f32_disp_OLD', 'f32_disp_NEW')}", flush=True)


if __name__ == "__main__":
    main()
