#!/usr/bin/env python
"""One-off TPU benchmark: operator-resident bf16 Pallas kernel vs the
fused-operator XLA path (see TODO.md perf item).  Prints per-path ms/group
and A-scans/s.  Run on the axon tunnel with a generous timeout; Mosaic
compiles remotely and has stalled before — each phase prints progress with
flush so a stall is attributable.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fdoct_tpu.calibration import Calibration
    from fdoct_tpu.config import PipelineConfig
    from fdoct_tpu.ops.pallas_kernels import (
        fused_recon_accumulate,
        fused_recon_raw_accumulate,
        fused_recon_resident,
    )
    from fdoct_tpu.pipeline import reconstruct

    print(f"devices: {jax.devices()}", flush=True)
    ROWS, COLS, NFFT, NDISP, BATCH = 512, 2048, 2048, 512, 8
    cfg = PipelineConfig(
        width=COLS, height=ROWS, binvalue=1, averages=BATCH,
        numfftpoints=NFFT, numdisplaypoints=NDISP,
        lambdamin=816e-9, lambdamax=884e-9, dtype="float32", compat=True)
    calib = Calibration.create(cfg)
    dev = jax.devices()[0]

    rng = np.random.default_rng(0)
    raw = jax.device_put(
        rng.integers(0, 255, (BATCH, ROWS, COLS)).astype(np.uint8), dev)
    pi = jax.device_put(jnp.zeros((ROWS, COLS), jnp.float32), dev)
    invb = jax.device_put(jnp.full((ROWS, COLS), 1 / 128.0, jnp.float32), dev)
    bg = jax.device_put(jnp.full((ROWS, COLS), 128.0, jnp.float32), dev)
    op_re = jnp.asarray(calib.op_re, jnp.float32)
    op_im = jnp.asarray(calib.op_im, jnp.float32)
    yr = ((raw.astype(jnp.float32) - pi) * invb)

    def timeit(name, fn, *args):
        print(f"[{name}] compiling...", flush=True)
        t0 = time.perf_counter()
        out = fn(*args)
        out.block_until_ready()
        print(f"[{name}] compiled in {time.perf_counter()-t0:.1f}s", flush=True)
        for _ in range(3):
            fn(*args).block_until_ready()
        t0 = time.perf_counter()
        n = 20
        for _ in range(n):
            out = fn(*args)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / n
        print(f"[{name}] {dt*1e3:.3f} ms/group = "
              f"{BATCH*ROWS/dt/1e6:.2f} M ascans/s", flush=True)
        return out, dt

    def xla_fused(fr):
        return reconstruct(fr, bg, pi, calib, cfg, method="fused").sum(axis=0)

    ref, _ = timeit("xla_fused", jax.jit(xla_fused), raw)
    out, _ = timeit("pallas_yr", fused_recon_accumulate, yr, op_re, op_im)
    print("pallas_yr maxrel:",
          float(jnp.max(jnp.abs(out - ref) / (jnp.abs(ref) + 1e-6))), flush=True)
    out, _ = timeit("pallas_raw", fused_recon_raw_accumulate,
                    raw, pi, invb, op_re, op_im)
    print("pallas_raw maxrel:",
          float(jnp.max(jnp.abs(out - ref) / (jnp.abs(ref) + 1e-6))), flush=True)
    out, _ = timeit("resident_bf16", fused_recon_resident,
                    raw, pi, invb, op_re, op_im)
    print("resident maxrel:",
          float(jnp.max(jnp.abs(out - ref) / (jnp.abs(ref) + 1e-6))), flush=True)


if __name__ == "__main__":
    main()
