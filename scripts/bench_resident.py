#!/usr/bin/env python
"""One-off TPU benchmark: Pallas reconstruction kernels vs the fused-operator
XLA path (see TODO.md perf item).  Uses the scan-chained driver (GROUPS
averaging groups per dispatch) so the dev tunnel's ~0.5-0.8 ms per-dispatch
RTT is amortized — per-call timing through the tunnel measures the tunnel,
not the chip.  Each phase prints progress with flush; failures (e.g. Mosaic
VMEM OOM at a tile size) are caught per path.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

ROWS, COLS, NFFT, NDISP, BATCH = 512, 2048, 2048, 512, 8
GROUPS = 8


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
    cfg = PipelineConfig(
        width=COLS, height=ROWS, binvalue=1, averages=BATCH,
        numfftpoints=NFFT, numdisplaypoints=NDISP,
        lambdamin=816e-9, lambdamax=884e-9, dtype="float32", compat=True)
    calib = Calibration.create(cfg)
    dev = jax.devices()[0]

    rng = np.random.default_rng(0)
    raw = jax.device_put(
        rng.integers(0, 255, (GROUPS, BATCH, ROWS, COLS)).astype(np.uint8), dev)
    pi = jax.device_put(jnp.zeros((ROWS, COLS), jnp.float32), dev)
    invb = jax.device_put(jnp.full((ROWS, COLS), 1 / 128.0, jnp.float32), dev)
    bg = jax.device_put(jnp.full((ROWS, COLS), 128.0, jnp.float32), dev)
    op_re = jnp.asarray(calib.op_re, jnp.float32)
    op_im = jnp.asarray(calib.op_im, jnp.float32)

    def scan_driver(group_fn):
        @jax.jit
        def run(all_raw):
            return jax.lax.scan(
                lambda c, fr: (c, group_fn(fr)), 0, all_raw)[1]
        return run

    def timeit(name, fn, *args):
        try:
            print(f"[{name}] compiling...", flush=True)
            t0 = time.perf_counter()
            out = fn(*args)
            out.block_until_ready()
            print(f"[{name}] compiled in {time.perf_counter()-t0:.1f}s",
                  flush=True)
            for _ in range(3):
                fn(*args).block_until_ready()
            n = 10
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(*args)
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / (n * GROUPS)
            print(f"[{name}] {dt*1e3:.3f} ms/group = "
                  f"{BATCH*ROWS/dt/1e6:.2f} M ascans/s", flush=True)
            return out
        except Exception as e:
            print(f"[{name}] FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:300]}", flush=True)
            return None

    def xla_group(fr):
        return reconstruct(fr, bg, pi, calib, cfg, method="fused").sum(axis=0)

    ref = timeit("xla_fused", scan_driver(xla_group), raw)

    def check(name, out):
        if out is not None and ref is not None:
            err = float(jnp.max(jnp.abs(out - ref) /
                                (jnp.abs(ref) + 1e-6)))
            print(f"[{name}] maxrel vs xla_fused: {err:.3e}", flush=True)

    def yr_group(fr):
        y = fr.astype(jnp.float32)
        yr = (y - pi) * invb
        return fused_recon_accumulate(yr, op_re, op_im)

    check("pallas_yr", timeit("pallas_yr", scan_driver(yr_group), raw))

    for tr, td in ((128, 256), (128, 512), (256, 256)):
        def raw_group(fr, tr=tr, td=td):
            return fused_recon_raw_accumulate(
                fr, pi, invb, op_re, op_im, tile_rows=tr, tile_depth=td)
        check(f"pallas_raw_{tr}x{td}",
              timeit(f"pallas_raw_{tr}x{td}", scan_driver(raw_group), raw))

    for tr in (256, 128):
        def res_group(fr, tr=tr):
            return fused_recon_resident(fr, pi, invb, op_re, op_im,
                                        tile_rows=tr)
        check(f"resident_bf16_{tr}",
              timeit(f"resident_bf16_{tr}", scan_driver(res_group), raw))


if __name__ == "__main__":
    main()
