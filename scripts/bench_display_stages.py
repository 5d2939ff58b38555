#!/usr/bin/env python
"""Stage-bisect the display chain cost on top of int8-direct reconstruction
(bench_display_epilogue.py measured +0.024 ms/group for form_bscan on a
(512,512) array — ~20x too slow for the bytes touched; find the stage).

Stages are cumulative prefixes of form_bscan (pipeline.py:268-289).
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
    from fdoct_tpu.ops.scale import (mask_dc_rows, normalize_minmax, to_db,
                                     threshold_floor, to_uint8)

    print(f"devices: {jax.devices()}", flush=True)
    cfg = PipelineConfig(
        width=COLS, height=ROWS, binvalue=1, averages=BATCH,
        numfftpoints=NFFT, numdisplaypoints=NDISP,
        lambdamin=816e-9, lambdamax=884e-9, dtype="float32", compat=True)
    calib = Calibration.create(cfg)
    lam = np.linspace(0, 1, COLS)
    spec = np.exp(-(((lam - 0.5) / 0.18) ** 2)) * 180.0 + 12.0
    bg_np = (1.0 + 0.05 * np.sin(np.linspace(0, 3, ROWS)))[:, None] * spec[None, :]
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
            float(run(fr))
            samples = []
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                float(run(fr))
                samples.append(time.perf_counter() - t0)
            ts[g] = float(np.median(samples))
        per = (ts[G2] - ts[G1]) / (G2 - G1)
        print(f"[{name}] {per*1e3:.3f} ms/group", flush=True)
        return per

    def scan_of(group_fn):
        @jax.jit
        def run(all_fr):
            def step(c, fr):
                return c + group_fn(fr).sum().astype(jnp.float32), 0.0
            return jax.lax.scan(step, jnp.float32(0), all_fr)[0]
        return run

    def msum(fr):
        return reconstruct_int8_direct(shift_u8_to_s8(fr), plan).sum(axis=0)

    thresh = float(cfg.bscanthreshold)

    def s0(fr):
        return msum(fr)

    def s1(fr):
        return msum(fr).T / BATCH + 1e-5

    def s2(fr):
        return to_db(s1(fr), eps=0.0, compat=True)

    def s3(fr):
        return mask_dc_rows(s2(fr))

    def s4(fr):
        return threshold_floor(s3(fr), thresh)

    def s5(fr):
        return normalize_minmax(s4(fr), 0.0, 1.0)

    def s6(fr):
        return to_uint8(s5(fr))

    # variants: no transpose anywhere; and u8 cast without normalize
    def v_noT(fr):
        x = msum(fr) / BATCH + 1e-5
        x = to_db(x, eps=0.0, compat=True)
        x = threshold_floor(x, thresh)
        return to_uint8(normalize_minmax(x, 0.0, 1.0))

    def v_u8_only(fr):
        return to_uint8(s1(fr) * (1.0 / 300.0))

    stages = [("s0_recon", s0), ("s1_T_div", s1), ("s2_db", s2),
              ("s3_mask", s3), ("s4_thresh", s4), ("s5_norm", s5),
              ("s6_u8_full", s6), ("v_no_transpose", v_noT),
              ("v_u8_no_norm", v_u8_only)]
    prev = None
    for name, fn in stages:
        per = timeit(name, scan_of(fn))
        if prev is not None and not name.startswith("v"):
            print(f"    delta vs prev: {(per-prev)*1e3:+.3f} ms", flush=True)
        if not name.startswith("v"):
            prev = per


if __name__ == "__main__":
    main()
