#!/usr/bin/env python
"""TPU A/B: two matmuls (re/im separately) vs ONE matmul against the
column-concatenated operator [op_re | op_im] — same FLOPs, half the input
HBM reads, for both the f32 fused path and the int8-direct path.

Motivation (TODO.md round 3): the f32 fused path runs at ~86% of bf16 peak
and int8-direct at ~75% of int8 peak; part of the residual may be the second
pass over the (B*ROWS, COLS) input.  If XLA does not already merge the two
dots that share an operand, concatenation removes one full input read
(8*512*2048 B/group for s8) at the cost of a (rows, 2*ndisp) split in the
epilogue.

Timing: honest differenced-scan methodology (see bench.py docstring) —
scalar-fetch completion, two scan lengths differenced, frames generated
on-device, median of REPEATS.
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
    from fdoct_tpu.int8direct import Int8DirectPlan

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
    bg_np = gain[:, None] * spec[None, :]
    pi_np = rng.uniform(0.0, 10.0, (ROWS, COLS))
    bg = jnp.asarray(bg_np, jnp.float32)
    pi = jnp.asarray(pi_np, jnp.float32)
    invb = 1.0 / bg

    op_re = jnp.asarray(calib.op_re, jnp.float32)
    op_im = jnp.asarray(calib.op_im, jnp.float32)
    op_cat = jnp.concatenate([op_re, op_im], axis=1)   # (COLS, 2*NDISP)

    plan = Int8DirectPlan.create(calib, cfg, bg_np, pi_np)
    oq_cat = jnp.concatenate([plan.oq_re, plan.oq_im], axis=1)
    s_cat = jnp.concatenate([plan.s_re, plan.s_im])
    const_cat = jnp.concatenate([plan.const_re, plan.const_im], axis=1)

    @functools.partial(jax.jit, static_argnums=0)
    def gen_u8(g):
        return jax.random.randint(
            jax.random.PRNGKey(0), (g, BATCH, ROWS, COLS), 0, 255,
            jnp.int32).astype(jnp.uint8)

    @functools.partial(jax.jit, static_argnums=0)
    def gen_s8(g):
        return (jax.random.randint(
            jax.random.PRNGKey(0), (g, BATCH, ROWS, COLS), 0, 255,
            jnp.int32) - 128).astype(jnp.int8)

    def timeit(name, run, gen):
        try:
            ts = {}
            for g in (G1, G2):
                fr = gen(g)
                fr.block_until_ready()
                t0 = time.perf_counter()
                float(run(fr))
                if g == G1:
                    print(f"[{name}] compiled in "
                          f"{time.perf_counter()-t0:.1f}s", flush=True)
                samples = []
                for _ in range(REPEATS):
                    t0 = time.perf_counter()
                    float(run(fr))
                    samples.append(time.perf_counter() - t0)
                ts[g] = float(np.median(samples))
            per = (ts[G2] - ts[G1]) / (G2 - G1)
            print(f"[{name}] {per*1e3:.3f} ms/group = "
                  f"{BATCH*ROWS/per/1e6:.2f} M ascans/s "
                  f"(median of {REPEATS})", flush=True)
            return per
        except Exception as e:
            print(f"[{name}] FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:300]}", flush=True)
            return None

    # ---- f32: two dots vs one concat dot ----
    def f32_two(fr):
        yr = (fr.astype(jnp.float32) - pi) * invb
        re = yr @ op_re
        im = yr @ op_im
        return jnp.sqrt(re * re + im * im).sum(axis=0)

    def f32_cat(fr):
        yr = (fr.astype(jnp.float32) - pi) * invb
        z = yr @ op_cat
        re, im = z[..., :NDISP], z[..., NDISP:]
        return jnp.sqrt(re * re + im * im).sum(axis=0)

    # ---- int8-direct: two dots vs one concat dot ----
    def i8_two(fr):
        acc_re = jnp.matmul(fr, plan.oq_re, preferred_element_type=jnp.int32)
        acc_im = jnp.matmul(fr, plan.oq_im, preferred_element_type=jnp.int32)
        re = (acc_re.astype(jnp.float32) * plan.s_re) * plan.row_gain_inv \
            + plan.const_re
        im = (acc_im.astype(jnp.float32) * plan.s_im) * plan.row_gain_inv \
            + plan.const_im
        return jnp.sqrt(re * re + im * im).sum(axis=0)

    def i8_cat(fr):
        acc = jnp.matmul(fr, oq_cat, preferred_element_type=jnp.int32)
        z = (acc.astype(jnp.float32) * s_cat) * plan.row_gain_inv + const_cat
        re, im = z[..., :NDISP], z[..., NDISP:]
        return jnp.sqrt(re * re + im * im).sum(axis=0)

    def scan_of(group_fn):
        @jax.jit
        def run(all_fr):
            def step(c, fr):
                return c + group_fn(fr).sum(), 0.0
            return jax.lax.scan(step, jnp.float32(0), all_fr)[0]
        return run

    per = {}
    per["f32_two"] = timeit("f32_two_matmuls", scan_of(f32_two), gen_u8)
    per["f32_cat"] = timeit("f32_concat_matmul", scan_of(f32_cat), gen_u8)
    per["i8_two"] = timeit("int8_two_matmuls", scan_of(i8_two), gen_s8)
    per["i8_cat"] = timeit("int8_concat_matmul", scan_of(i8_cat), gen_s8)

    if per["f32_two"] and per["f32_cat"]:
        print(f"f32 concat speedup: {per['f32_two']/per['f32_cat']:.3f}x",
              flush=True)
    if per["i8_two"] and per["i8_cat"]:
        print(f"int8 concat speedup: {per['i8_two']/per['i8_cat']:.3f}x",
              flush=True)

    # numeric check: concat must be elementwise-identical (same multiplies,
    # same order — only the layout differs)
    one_u8, one_s8 = gen_u8(1)[0], gen_s8(1)[0]
    a = np.asarray(jax.jit(f32_two)(one_u8))
    b = np.asarray(jax.jit(f32_cat)(one_u8))
    print(f"f32 concat max rel diff: "
          f"{np.abs(a-b).max()/ (np.abs(a).max()+1e-9):.3e}", flush=True)
    c = np.asarray(jax.jit(i8_two)(one_s8))
    d = np.asarray(jax.jit(i8_cat)(one_s8))
    print(f"int8 concat max rel diff: "
          f"{np.abs(c-d).max()/ (np.abs(c).max()+1e-9):.3e}", flush=True)


if __name__ == "__main__":
    main()
