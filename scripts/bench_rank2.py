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

import functools
import sys
import time
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

    @functools.partial(jax.jit, static_argnums=0)
    def gen_s8(g):
        return (jax.random.randint(
            jax.random.PRNGKey(0), (g, BATCH, ROWS, COLS), 0, 255,
            jnp.int32) - 128).astype(jnp.int8)

    @functools.partial(jax.jit, static_argnums=0)
    def gen_u8(g):
        return jax.random.randint(
            jax.random.PRNGKey(0), (g, BATCH, ROWS, COLS), 0, 255,
            jnp.int32).astype(jnp.uint8)

    def scan_of(group_fn):
        @jax.jit
        def run(all_fr):
            def step(c, fr):
                return c + group_fn(fr).sum(), 0.0
            return jax.lax.scan(step, jnp.float32(0), all_fr)[0]
        return run

    disp = lambda m: form_bscan(m, cfg, averages=BATCH).bscandisp \
        .astype(jnp.float32)  # noqa: E731
    variants = [
        ("f32_disp", scan_of(lambda fr: disp(
            reconstruct(fr, bg, pi, calib, cfg, "fused").sum(axis=0))), "u8"),
        ("i8_rank1_disp", scan_of(lambda fr: disp(
            reconstruct_int8_direct(fr, p1).sum(axis=0))), "s8"),
        ("i8_rank2_disp", scan_of(lambda fr: disp(
            reconstruct_int8_direct(fr, p2).sum(axis=0))), "s8"),
    ]

    frames = {}
    for g in (G1, G2):
        frames[("s8", g)] = gen_s8(g)
        frames[("s8", g)].block_until_ready()
        frames[("u8", g)] = gen_u8(g)
        frames[("u8", g)].block_until_ready()
    for name, run, kind in variants:
        t0 = time.perf_counter()
        float(run(frames[(kind, G1)]))
        float(run(frames[(kind, G2)]))
        print(f"[{name}] compiled in {time.perf_counter()-t0:.1f}s",
              flush=True)

    samples = {name: {G1: [], G2: []} for name, _, _ in variants}
    for _ in range(REPEATS):
        for g in (G1, G2):
            for name, run, kind in variants:
                t0 = time.perf_counter()
                float(run(frames[(kind, g)]))
                samples[name][g].append(time.perf_counter() - t0)

    pers = {}
    for name, _, _ in variants:
        t1 = float(np.median(samples[name][G1]))
        t2 = float(np.median(samples[name][G2]))
        per = (t2 - t1) / (G2 - G1)
        pers[name] = per
        print(f"[{name}] {per*1e3:.3f} ms/group = "
              f"{BATCH*ROWS/per/1e6:.2f} M ascans/s", flush=True)

    print(f"\nrank-2 vs f32: {pers['f32_disp']/pers['i8_rank2_disp']:.3f}x  "
          f"rank-1 vs f32: {pers['f32_disp']/pers['i8_rank1_disp']:.3f}x  "
          f"rank-2 cost vs rank-1: "
          f"{pers['i8_rank2_disp']/pers['i8_rank1_disp']:.3f}x", flush=True)


if __name__ == "__main__":
    main()
