#!/usr/bin/env python
"""TPU A/B: what does the display chain (form_bscan: dB, threshold,
min/max normalize, uint8, transpose) cost on top of reconstruction — for
the f32 fused path vs the int8-direct path, all four measured in ONE run
so chip-load windows cancel.

Context: with int8-direct reconstruction at ~2.2x f32, the display chain
is no longer free by comparison; if it costs ~0.02 ms/group it caps the
full int8 chain well below the reconstruct-only rate.

Honest differenced-scan methodology (see bench.py docstring).
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
    from fdoct_tpu.int8direct import (Int8DirectPlan, reconstruct_int8_direct,
                                      shift_u8_to_s8)
    from fdoct_tpu.pipeline import form_bscan, reconstruct

    print(f"devices: {jax.devices()}", flush=True)
    cfg = PipelineConfig(
        width=COLS, height=ROWS, binvalue=1, averages=BATCH,
        numfftpoints=NFFT, numdisplaypoints=NDISP,
        lambdamin=816e-9, lambdamax=884e-9, dtype="float32", compat=True)
    calib = Calibration.create(cfg)

    lam = np.linspace(0, 1, COLS)
    spec = np.exp(-(((lam - 0.5) / 0.18) ** 2)) * 180.0 + 12.0
    gain = 1.0 + 0.05 * np.sin(np.linspace(0, 3, ROWS))
    bg_np = gain[:, None] * spec[None, :]
    bg = jnp.asarray(bg_np, jnp.float32)
    pi = jnp.zeros((ROWS, COLS), jnp.float32)
    plan = Int8DirectPlan.create(calib, cfg, bg_np, np.zeros((ROWS, COLS)))

    @functools.partial(jax.jit, static_argnums=0)
    def gen_u8(g):
        return jax.random.randint(
            jax.random.PRNGKey(0), (g, BATCH, ROWS, COLS), 0, 255,
            jnp.int32).astype(jnp.uint8)

    def timeit(name, run):
        ts = {}
        for g in (G1, G2):
            fr = gen_u8(g)
            fr.block_until_ready()
            t0 = time.perf_counter()
            float(run(fr))
            if g == G1:
                print(f"[{name}] compiled in {time.perf_counter()-t0:.1f}s",
                      flush=True)
            samples = []
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                float(run(fr))
                samples.append(time.perf_counter() - t0)
            ts[g] = float(np.median(samples))
        per = (ts[G2] - ts[G1]) / (G2 - G1)
        print(f"[{name}] {per*1e3:.3f} ms/group = "
              f"{BATCH*ROWS/per/1e6:.2f} M ascans/s (median of {REPEATS})",
              flush=True)
        return per

    def scan_of(group_fn):
        @jax.jit
        def run(all_fr):
            def step(c, fr):
                return c + group_fn(fr).sum(), 0.0
            return jax.lax.scan(step, jnp.float32(0), all_fr)[0]
        return run

    def f32_recon(fr):
        return reconstruct(fr, bg, pi, calib, cfg, method="fused").sum(axis=0)

    def f32_disp(fr):
        m = f32_recon(fr)
        return form_bscan(m, cfg, averages=BATCH).bscandisp.astype(jnp.float32)

    def i8_recon(fr):
        return reconstruct_int8_direct(shift_u8_to_s8(fr), plan).sum(axis=0)

    def i8_disp(fr):
        m = i8_recon(fr)
        return form_bscan(m, cfg, averages=BATCH).bscandisp.astype(jnp.float32)

    per = {}
    per["f32_recon"] = timeit("f32_recon_only", scan_of(f32_recon))
    per["f32_disp"] = timeit("f32_recon+display", scan_of(f32_disp))
    per["i8_recon"] = timeit("int8_recon_only", scan_of(i8_recon))
    per["i8_disp"] = timeit("int8_recon+display", scan_of(i8_disp))

    print(f"display cost on f32 path: "
          f"{(per['f32_disp']-per['f32_recon'])*1e3:+.3f} ms/group", flush=True)
    print(f"display cost on int8 path: "
          f"{(per['i8_disp']-per['i8_recon'])*1e3:+.3f} ms/group", flush=True)


if __name__ == "__main__":
    main()
