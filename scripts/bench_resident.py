#!/usr/bin/env python
"""TPU benchmark: Pallas reconstruction kernels vs the fused-operator XLA
path, under HONEST timing (see bench.py docstring: through the dev tunnel
`block_until_ready` does not wait, so we force completion with a scalar
fetch and difference two scan lengths so tunnel RTT cancels).  Frames are
generated on-device.  Each phase prints progress with flush; failures
(e.g. Mosaic VMEM OOM at a tile size) are caught per path."""
from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

ROWS, COLS, NFFT, NDISP, BATCH = 512, 2048, 2048, 512, 8
G1, G2 = 64, 256
REPEATS = 4


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

    pi = jnp.zeros((ROWS, COLS), jnp.float32)
    invb = jnp.full((ROWS, COLS), 1 / 128.0, jnp.float32)
    bg = jax.device_put(jnp.full((ROWS, COLS), 128.0, jnp.float32), dev)
    op_re = jnp.asarray(calib.op_re, jnp.float32)
    op_im = jnp.asarray(calib.op_im, jnp.float32)

    @functools.partial(jax.jit, static_argnums=0)
    def gen_frames(g):
        key = jax.random.PRNGKey(0)
        return jax.random.randint(
            key, (g, BATCH, ROWS, COLS), 0, 255, jnp.int32).astype(jnp.uint8)

    frames = {g: gen_frames(g) for g in (G1, G2)}
    for f in frames.values():
        f.block_until_ready()

    def timeit(name, group_fn):
        @jax.jit
        def run(all_raw):
            def step(c, fr):
                return c + group_fn(fr).sum(), 0.0
            return jax.lax.scan(step, jnp.float32(0), all_raw)[0]

        try:
            print(f"[{name}] compiling...", flush=True)
            t0 = time.perf_counter()
            ref = float(run(frames[G1]))
            float(run(frames[G2]))
            print(f"[{name}] compiled in {time.perf_counter()-t0:.1f}s",
                  flush=True)
            ts = {}
            for g in (G1, G2):
                best = float("inf")
                for _ in range(REPEATS):
                    t0 = time.perf_counter()
                    float(run(frames[g]))
                    best = min(best, time.perf_counter() - t0)
                ts[g] = best
            per = (ts[G2] - ts[G1]) / (G2 - G1)
            print(f"[{name}] {per*1e3:.3f} ms/group = "
                  f"{BATCH*ROWS/per/1e6:.2f} M ascans/s", flush=True)
            return ref
        except Exception as e:
            print(f"[{name}] FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:300]}", flush=True)
            return None

    def xla_group(fr):
        return reconstruct(fr, bg, pi, calib, cfg, method="fused").sum(axis=0)
    ref = timeit("xla_fused_f32", xla_group)

    # int8 MXU display path (matmul_precision="int8"): quantized operator,
    # per-row dynamically quantized input (DC removed pre-quantization).
    # The quantized tables are only materialized when the config asks, so
    # build a dedicated calibration for this path.
    cfg8 = cfg.replace(matmul_precision="int8")
    calib8 = Calibration.create(cfg8)

    def xla_int8_group(fr):
        return reconstruct(fr, bg, pi, calib8, cfg8, method="fused").sum(axis=0)

    # elementwise oracle on ONE group: catches row/tile permutations and
    # cancelling errors that a scalar-sum check would miss
    one_group = frames[G1][0]
    ref_group = np.asarray(jax.jit(xla_group)(one_group))

    def check_elementwise(name, group_fn, rtol=5e-2):
        try:
            out = np.asarray(jax.jit(group_fn)(one_group))
            err = np.abs(out - ref_group).max() / (np.abs(ref_group).max() + 1e-9)
            ok = "ok" if err < rtol else "MISMATCH"
            print(f"[{name}] elementwise max rel err vs xla_fused: "
                  f"{err:.3e} ({ok})", flush=True)
        except Exception as e:
            print(f"[{name}] elementwise check FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)

    def check(name, val):
        if val is not None and ref is not None:
            err = abs(val - ref) / (abs(ref) + 1e-9)
            print(f"[{name}] scalar rel err vs xla_fused: {err:.3e}",
                  flush=True)

    check_elementwise("xla_int8", xla_int8_group)
    check("xla_int8", timeit("xla_int8", xla_int8_group))

    # int8-direct production path (fdoct_tpu.int8direct): background folded
    # into the quantized operator, zero elementwise work on the big input.
    # The full A/B + on-chip display characterization lives in
    # scripts/bench_int8.py; this row keeps the resident-bench comparable.
    from fdoct_tpu.int8direct import (Int8DirectPlan, reconstruct_int8_direct,
                                      shift_u8_to_s8)
    cfgd = cfg.replace(matmul_precision="int8_direct")
    plan = Int8DirectPlan.create(
        calib, cfgd, np.full((ROWS, COLS), 128.0), np.zeros((ROWS, COLS)))

    def int8_direct_group(fr):
        return reconstruct_int8_direct(shift_u8_to_s8(fr), plan).sum(axis=0)

    check_elementwise("int8_direct", int8_direct_group)
    check("int8_direct", timeit("int8_direct", int8_direct_group))

    if "--quick" in sys.argv:   # xla paths only (fast TPU A/B through the tunnel)
        return

    op_re16, op_im16 = op_re.astype(jnp.bfloat16), op_im.astype(jnp.bfloat16)

    def xla_bf16_group(fr):
        y = fr.astype(jnp.float32)
        yr = ((y - pi) * invb).astype(jnp.bfloat16)
        z = yr.reshape(BATCH * ROWS, COLS)
        re = jnp.dot(z, op_re16, preferred_element_type=jnp.float32)
        im = jnp.dot(z, op_im16, preferred_element_type=jnp.float32)
        mag = jnp.sqrt(re * re + im * im)
        return mag.reshape(BATCH, ROWS, NDISP).sum(axis=0)
    check_elementwise("xla_bf16", xla_bf16_group)
    check("xla_bf16", timeit("xla_bf16", xla_bf16_group))

    def yr_group(fr):
        y = fr.astype(jnp.float32)
        yr = (y - pi) * invb
        return fused_recon_accumulate(yr, op_re, op_im)
    check_elementwise("pallas_yr", yr_group)
    check("pallas_yr", timeit("pallas_yr", yr_group))

    for tr, td in ((128, 512), (256, 512), (256, 256)):
        def raw_group(fr, tr=tr, td=td):
            return fused_recon_raw_accumulate(
                fr, pi, invb, op_re, op_im, tile_rows=tr, tile_depth=td)
        check_elementwise(f"pallas_raw_{tr}x{td}", raw_group)
        check(f"pallas_raw_{tr}x{td}",
              timeit(f"pallas_raw_{tr}x{td}", raw_group))

    for tr in (256, 128):
        def res_group(fr, tr=tr):
            return fused_recon_resident(fr, pi, invb, op_re, op_im,
                                        tile_rows=tr)
        check_elementwise(f"resident_bf16_{tr}", res_group)
        check(f"resident_bf16_{tr}",
              timeit(f"resident_bf16_{tr}", res_group))


if __name__ == "__main__":
    main()
