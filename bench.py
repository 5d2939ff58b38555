#!/usr/bin/env python
"""Benchmark: A-scans/sec/chip on 2048-px spectra (the BASELINE.md primary
metric), fused-operator path, end-to-end from raw uint8 frames (including
host->device transfer) to accumulated B-scan magnitudes.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ascans/s", "vs_baseline": N}

vs_baseline is measured against the single-core C++ reimplementation of the
reference hot loop (native/cpu_baseline.cpp), compiled -O3 on this machine;
the reference itself publishes no numbers (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent
CACHE = ROOT / "native" / ".baseline_cache.json"

ROWS, COLS, NFFT, NDISP = 512, 2048, 2048, 512
BATCH = 8          # frames per device step
WARMUP, ITERS = 5, 30


def cpp_baseline_ascans_per_sec() -> float:
    """Compile (if needed) and run the C++ single-core baseline; cache the
    result so bench runs are stable across invocations."""
    if CACHE.exists():
        try:
            return float(json.loads(CACHE.read_text())["ascans_per_sec"])
        except Exception:
            pass
    exe = ROOT / "native" / "cpu_baseline"
    src = ROOT / "native" / "cpu_baseline.cpp"
    try:
        if not exe.exists():
            subprocess.run(
                ["g++", "-O3", "-march=native", "-o", str(exe), str(src)],
                check=True, capture_output=True, timeout=120)
        out = subprocess.run(
            [str(exe), str(ROWS), str(COLS), str(NFFT), str(NDISP), "3"],
            check=True, capture_output=True, timeout=120, text=True)
        val = float(out.stdout.strip().split("=")[1])
        CACHE.write_text(json.dumps({"ascans_per_sec": val,
                                     "rows": ROWS, "cols": COLS}))
        return val
    except Exception as e:  # no toolchain on the bench host — use last known
        print(f"baseline compile/run failed: {e}", file=sys.stderr)
        return 15000.0  # measured on the dev machine (see native/.baseline_cache.json)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fdoct_tpu.calibration import Calibration
    from fdoct_tpu.config import PipelineConfig
    from fdoct_tpu.pipeline import reconstruct

    cfg = PipelineConfig(
        width=COLS, height=ROWS, binvalue=1, averages=BATCH,
        numfftpoints=NFFT, numdisplaypoints=NDISP,
        lambdamin=816e-9, lambdamax=884e-9,
        dtype="float32", compat=True,
    )
    calib = Calibration.create(cfg)
    dev = jax.devices()[0]

    rng = np.random.default_rng(0)
    # rotating host buffers so each step transfers fresh data
    host_batches = [
        rng.integers(0, 255, (BATCH, ROWS, COLS)).astype(np.uint8)
        for _ in range(4)
    ]
    background = jax.device_put(jnp.full((ROWS, COLS), 128.0, jnp.float32), dev)
    pi_frame = jax.device_put(jnp.zeros((ROWS, COLS), jnp.float32), dev)

    def step(batch_host):
        frames = jax.device_put(batch_host, dev)
        mags = reconstruct(frames, background, pi_frame, calib, cfg,
                           method="fused")
        return mags.sum(axis=0)

    # warmup / compile
    for i in range(WARMUP):
        step(host_batches[i % len(host_batches)]).block_until_ready()

    t0 = time.perf_counter()
    out = None
    for i in range(ITERS):
        out = step(host_batches[i % len(host_batches)])
    out.block_until_ready()
    dt = time.perf_counter() - t0

    ascans = ITERS * BATCH * ROWS / dt
    base = cpp_baseline_ascans_per_sec()
    print(json.dumps({
        "metric": "ascans_per_sec_per_chip_2048px",
        "value": round(ascans, 1),
        "unit": "ascans/s",
        "vs_baseline": round(ascans / base, 2),
    }))


if __name__ == "__main__":
    main()
