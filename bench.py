#!/usr/bin/env python
"""Benchmark: A-scans/sec/chip on 2048-px spectra (the BASELINE.md primary
metric), fused-operator path.

Measures steady-state chip throughput of the full per-group pipeline —
uint8 raw frames → preprocess → background ratio → fused MXU reconstruction
→ group accumulation → displayed B-scan — on device-resident frame batches.

Timing methodology (important on this dev tunnel): `block_until_ready`
through the remote 'axon' platform does NOT actually wait for execution, so
naive dispatch-loop timing measures RPC dispatch, not the chip.  Instead we
force completion with a scalar value fetch and difference two scan lengths
(G2 − G1 groups) so the per-group time is tunnel-RTT-free:

    per_group = (t(G2) − t(G1)) / (G2 − G1)

Frames are generated on-device (jax.random) so the ~35 MB/s tunnel never
touches the measured path; a production host feeds frames over local
PCIe/DMA.  The tunnel-inclusive number is reported on stderr for reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ascans/s", "vs_baseline": N, ...}

The headline "value" is the FIXED scan-chained (live-streaming) shape at
median-of-REPEATS — reproducible, not best-of-anything (round-3 policy).
The batched/offline shape and the int8_direct display mode are extra keys
and stderr info rows.

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
G1, G2 = 64, 256   # scan lengths for the differenced timing
REPEATS = 6


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
    import functools

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

    background = jax.device_put(jnp.full((ROWS, COLS), 128.0, jnp.float32), dev)
    pi_frame = jax.device_put(jnp.zeros((ROWS, COLS), jnp.float32), dev)

    def group_step(frames):
        mags = reconstruct(frames, background, pi_frame, calib, cfg,
                           method="fused")
        return form_bscan(mags.sum(axis=0), cfg, averages=BATCH).bscandisp

    # frames generated on-device: the tunnel never touches the timed path
    @functools.partial(jax.jit, static_argnums=0)
    def gen_frames(g):
        key = jax.random.PRNGKey(0)
        return jax.random.randint(
            key, (g, BATCH, ROWS, COLS), 0, 255, jnp.int32).astype(jnp.uint8)

    # Headline policy (round 3, VERDICT r2): ONE fixed shape — the
    # scan-chained live-streaming form — timed as median-of-REPEATS at each
    # scan length; the batched/offline shape and the int8_direct display
    # mode are reported alongside on stderr and as extra JSON keys, never
    # as the headline.  The scalar carry/sum depends on every group's
    # displayed B-scan, so nothing is dead-code-eliminated and the final
    # float() fetch forces true completion through the tunnel.
    @jax.jit
    def scan_groups(all_frames):
        def step(c, fr):
            return c + group_step(fr).sum(), 0.0
        return jax.lax.scan(step, jnp.float32(0), all_frames)[0]

    # load-normalized reference kernel (round-4 policy, VERDICT r3 weak-5):
    # a bare bf16 matmul pair of the headline shape, scan-chained exactly
    # like the pipeline.  Interleaved with the headline inside the SAME
    # repeat loop, its time sees the same shared-chip load window, so
    # headline/ref is a load-normalized ratio comparable across rounds
    # where the raw number swings ±30% with neighbors' work.
    op_ref_bf16 = jnp.asarray(calib.op_re, jnp.bfloat16)
    op_im_bf16 = jnp.asarray(calib.op_im, jnp.bfloat16)

    @jax.jit
    def ref_groups(all_frames):
        def step(c, fr):
            z = fr.astype(jnp.bfloat16)
            re = jnp.matmul(z, op_ref_bf16,
                            preferred_element_type=jnp.float32)
            im = jnp.matmul(z, op_im_bf16,
                            preferred_element_type=jnp.float32)
            return c + re.sum() + im.sum(), 0.0
        return jax.lax.scan(step, jnp.float32(0), all_frames)[0]

    @jax.jit
    def batched_groups(all_frames):
        # flat formulation: ONE matmul over every frame of every group,
        # then a vmapped display chain.  Kept as a COMPARISON row only —
        # since round 5 Session.process_group scans over groups (this flat
        # form measured 20% slower at the flagship shape, BENCH.md
        # scan-vs-flat); the offline C-scan assembly remains flat-shaped
        mags = reconstruct(all_frames, background, pi_frame, calib, cfg,
                           method="fused")          # (g, BATCH, ROWS, NDISP)
        msum = mags.sum(axis=1)
        disp = jax.vmap(
            lambda m: form_bscan(m, cfg, averages=BATCH).bscandisp)(msum)
        return disp.sum()

    def measure(fn, g, gen=None, pair_with=None):
        """Median-of-REPEATS at scan length ``g``.  With ``pair_with``, a
        second jitted fn is timed ALTERNATELY inside the same repeat loop
        (one sample each per sweep) so both see the identical chip-load
        window; returns ((med, spread), (med_pair, spread_pair))."""
        frames = (gen or gen_frames)(g)
        frames.block_until_ready()
        float(fn(frames))                     # compile + warm
        if pair_with is not None:
            float(pair_with(frames))
        samples, psamples = [], []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            float(fn(frames))                 # fetch == real completion
            samples.append(time.perf_counter() - t0)
            if pair_with is not None:
                t0 = time.perf_counter()
                float(pair_with(frames))
                psamples.append(time.perf_counter() - t0)
        med = float(np.median(samples))
        spread = (max(samples) - min(samples)) / med
        if pair_with is None:
            return med, spread
        pmed = float(np.median(psamples))
        return (med, spread), (pmed, (max(psamples) - min(psamples)) / pmed)

    def per_group_paired(name, fn, g1, g2):
        """Alongside-row timing, INTERLEAVED with the bare-matmul reference
        kernel in the same repeat loops (the round-4 headline policy,
        extended to every row per the round-4 verdict): both see the
        identical shared-chip load window, so ``per/ref`` is a
        load-normalized ratio comparable across rounds where the raw
        number swings ±30% with neighbors' work.  Returns (per_group,
        ref_ratio_or_None); raises on inconsistent medians — an alongside
        row hitting a wild load window must not discard the whole bench
        (callers guard with try/except)."""
        (t1, s1), (r1, rs1) = measure(fn, g1, pair_with=ref_groups)
        (t2, s2), (r2, rs2) = measure(fn, g2, pair_with=ref_groups)
        if not (t2 > t1 > 0):
            print(f"warn: inconsistent {name} timings t({g1})={t1:.4f}s "
                  f"t({g2})={t2:.4f}s — refusing to report a nonsense "
                  f"metric", file=sys.stderr)
            raise RuntimeError(f"inconsistent {name} timings")
        per = (t2 - t1) / (g2 - g1)
        # an alongside row without a TRUSTWORTHY ratio is NOT publishable:
        # a wild window once emitted a 614 M "int8_batched" raw row
        # (0.007 ms/group, ~7x the physical ceiling) whose only tell was
        # the missing ratio, and another published batched_ref_ratio=3.97
        # when the ref's own differencing collapsed (an implied 0.022 ms
        # "bare matmul pair").  Three checks: ref medians must difference
        # positively, the ref samples must not be wildly spread, and the
        # ratio must be physically plausible (the pipeline sits within
        # [0.2, 3]x its own bare matmuls on every calm window measured).
        if not (r2 > r1 > 0) or max(rs1, rs2) > 0.5:
            print(f"warn: {name} ref timings untrustworthy "
                  f"(t({g1})={r1:.4f}s t({g2})={r2:.4f}s, spreads "
                  f"{rs1*100:.0f}%/{rs2*100:.0f}%) — row dropped",
                  file=sys.stderr)
            raise RuntimeError(f"{name} ref timings untrustworthy")
        ratio = per / ((r2 - r1) / (g2 - g1))
        if not (0.2 <= ratio <= 3.0):
            print(f"warn: {name} ratio {ratio:.2f} outside the physical "
                  f"[0.2, 3] band — differenced ref collapsed; row "
                  f"dropped", file=sys.stderr)
            raise RuntimeError(f"{name} ratio implausible")
        print(f"info: {name} per-group {per*1e3:.3f} ms "
              f"(median of {REPEATS}; spread {s1*100:.1f}%/{s2*100:.1f}%; "
              f"ref ratio {ratio:.3f})", file=sys.stderr)
        return per, ratio

    # the batched shape materializes the whole f32 ratio intermediate
    # (G·8·512·2048·4 B); differencing sizes stay ≤64 groups (2 GB) so the
    # measurement reflects MXU rate, not HBM spill at artificial depths.
    # The headline is timed INTERLEAVED with the bare-matmul reference
    # kernel; headline/ref is the load-normalized ratio (see ref_groups).
    (h1, hs1), (r1, _) = measure(scan_groups, G1, pair_with=ref_groups)
    (h2, hs2), (r2, _) = measure(scan_groups, G2, pair_with=ref_groups)
    if not (h2 > h1 > 0):
        print(f"FATAL: inconsistent scan (HEADLINE) timings t({G1})={h1:.4f}s "
              f"t({G2})={h2:.4f}s — refusing to report a nonsense metric",
              file=sys.stderr)
        raise SystemExit(1)
    per_group = (h2 - h1) / (G2 - G1)
    print(f"info: scan (HEADLINE) per-group {per_group*1e3:.3f} ms "
          f"(median of {REPEATS}; spread {hs1*100:.1f}%/{hs2*100:.1f}%)",
          file=sys.stderr)
    ref_ratio = None
    if r2 > r1 > 0:
        per_ref = (r2 - r1) / (G2 - G1)
        ref_ratio = per_group / per_ref
        print(f"info: ref bare-matmul per-group {per_ref*1e3:.3f} ms; "
              f"load-normalized headline/ref = {ref_ratio:.3f}",
              file=sys.stderr)
    else:
        print(f"info: ref kernel timings inconsistent "
              f"(t({G1})={r1:.4f}s t({G2})={r2:.4f}s); ratio skipped",
              file=sys.stderr)
    try:
        per_batched, batched_ratio = per_group_paired(
            "batched", batched_groups, 16, 64)
    except Exception as e:  # pragma: no cover - bench resilience
        print(f"info: batched row skipped: {e}", file=sys.stderr)
        per_batched = batched_ratio = None
    ascans = BATCH * ROWS / per_group

    # ---- int8_direct display mode (reported alongside, never headline):
    # background/pi folded into the quantized operator, device-side u8->s8
    # bias shift, two s8 MXU matmuls straight from HBM (fdoct_tpu.int8direct;
    # accuracy characterized in tests/test_int8direct.py + BENCH.md)
    int8_ascans = None
    int8_batched_ascans = None
    int8_ratio = int8b_ratio = None
    try:
        from fdoct_tpu.int8direct import (Int8DirectPlan,
                                          reconstruct_int8_direct,
                                          shift_u8_to_s8)
        rng = np.random.default_rng(1)
        lam = np.linspace(0, 1, COLS)
        spec = np.exp(-(((lam - 0.5) / 0.18) ** 2)) * 180.0 + 12.0
        gain = 1.0 + 0.05 * np.sin(np.linspace(0, 3, ROWS))
        bg8 = gain[:, None] * spec[None, :] * (
            1 + 0.003 * rng.standard_normal((ROWS, COLS)))
        cfg8 = cfg.replace(matmul_precision="int8_direct")
        plan = Int8DirectPlan.create(calib, cfg8, bg8,
                                     np.zeros((ROWS, COLS)))

        @jax.jit
        def int8_groups(all_frames):
            def step(c, fr):
                m = reconstruct_int8_direct(shift_u8_to_s8(fr), plan)
                disp = form_bscan(m.sum(axis=0), cfg,
                                  averages=BATCH).bscandisp
                return c + disp.sum(), 0.0
            return jax.lax.scan(step, jnp.float32(0), all_frames)[0]

        # NOTE (round 5, measured and closed): a "bare s8 matmul pair"
        # reference for a fraction-of-int8-peak ratio was tried and read
        # NON-PHYSICAL (pipeline/ref = 0.67, i.e. the reference kernel was
        # slower than the full pipeline it was meant to bound): the s32
        # liveness reduction a bare pair needs costs more than the real
        # pipeline's fused f32 epilogue.  There is no cheap honest
        # denominator below the pipeline itself; the bf16-pair ratio
        # stays the int8 row's cross-round comparable.
        per_int8, int8_ratio = per_group_paired(
            "int8_direct", int8_groups, G1, G2)
        int8_ascans = BATCH * ROWS / per_int8

        # flat/batched form of the int8 path (comparison row; the session
        # scans over groups since round 5 — BENCH.md scan-vs-flat): ONE
        # s8 matmul pair over every frame of every group + a vmapped
        # display chain, which amortizes the per-group display launches
        # that bound the scan shape (see BENCH.md display-epilogue note)
        @jax.jit
        def int8_batched(all_frames):
            m = reconstruct_int8_direct(shift_u8_to_s8(all_frames), plan)
            msum = m.sum(axis=1)
            disp = jax.vmap(
                lambda s: form_bscan(s, cfg, averages=BATCH).bscandisp)(msum)
            return disp.sum()

        per_int8b, int8b_ratio = per_group_paired(
            "int8_batched", int8_batched, 16, 64)
        int8_batched_ascans = BATCH * ROWS / per_int8b
    except Exception as e:  # pragma: no cover - bench resilience
        print(f"info: int8 row(s) incomplete: {e}", file=sys.stderr)

    # ---- informational: tunnel-inclusive streaming number.  Non-fatal:
    # this touches the host->device tunnel, whose transient failures must
    # not discard the already-measured metric rows above ----
    try:
        rng = np.random.default_rng(0)
        host = rng.integers(0, 255, (8, BATCH, ROWS, COLS)).astype(np.uint8)
        t0 = time.perf_counter()
        float(scan_groups(jax.device_put(host, dev)))
        dt_stream = time.perf_counter() - t0
        stream_ascans = 8 * BATCH * ROWS / dt_stream
        print(f"info: per-group {per_group*1e3:.3f} ms on-device (scan shape, "
              f"the headline); tunnel-inclusive streaming = "
              f"{stream_ascans:.0f} ascans/s "
              f"(dev tunnel, not representative of local host feed)",
              file=sys.stderr)
    except Exception as e:  # pragma: no cover - bench resilience
        print(f"info: streaming info row skipped (tunnel error): {e}",
              file=sys.stderr)

    base = cpp_baseline_ascans_per_sec()
    out = {
        "metric": "ascans_per_sec_per_chip_2048px",
        "value": round(ascans, 1),
        "unit": "ascans/s",
        "vs_baseline": round(ascans / base, 2),
    }
    if ref_ratio is not None:
        # load-normalized row: headline time / bare-bf16-matmul time of the
        # same shape, measured interleaved — stable where the raw number
        # swings with shared-chip load (BENCH.md round-4 policy)
        out["headline_ref_ratio"] = round(ref_ratio, 3)
    # worst per-length sample spread of the headline medians: a reader of
    # the persisted JSON can tell a calm window (<20%) from a pathological
    # one (94% observed) without the stderr log
    out["headline_spread"] = round(max(hs1, hs2), 3)
    # alongside rows (display modes / offline shape), not the headline.
    # Every row carries its load-normalized *_ref_ratio (time / interleaved
    # bare-matmul time, round-5 VERDICT item 4) so a future round can tell
    # shared-chip weather from a real regression.
    if per_batched is not None:
        out["batched_ascans_per_sec"] = round(BATCH * ROWS / per_batched, 1)
    if batched_ratio is not None:
        out["batched_ref_ratio"] = round(batched_ratio, 3)
    if int8_ascans is not None:
        out["int8_direct_ascans_per_sec"] = round(int8_ascans, 1)
    if int8_ratio is not None:
        out["int8_ref_ratio"] = round(int8_ratio, 3)
    if int8_batched_ascans is not None:
        out["int8_batched_ascans_per_sec"] = round(int8_batched_ascans, 1)
    if int8b_ratio is not None:
        out["int8_batched_ref_ratio"] = round(int8b_ratio, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
