#!/usr/bin/env python
"""Stage ablation on the real chip: where do the ~0.45 ms/group go?

Every reconstruction path (plain XLA, all Pallas tilings) lands at the same
~0.45 ms/group (scripts/bench_resident.py), so the bound is common to all of
them.  This script times each stage in isolation with the same scan-chained
driver to localize it:

  a) u8->f32 widen + ratio elementwise only
  b) matmul pair only (from resident f32 yr)
  c) matmul pair only (bf16 operands)
  d) magnitude+accumulate only
  e) full group, f32
  f) full group with bf16 frames widened on device
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

ROWS, COLS, NDISP, BATCH = 512, 2048, 512, 8
GROUPS = 8


def main() -> None:
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    raw = jax.device_put(
        rng.integers(0, 255, (GROUPS, BATCH, ROWS, COLS)).astype(np.uint8), dev)
    yr_all = jax.device_put(
        rng.standard_normal((GROUPS, BATCH, ROWS, COLS)).astype(np.float32), dev)
    pi = jnp.zeros((ROWS, COLS), jnp.float32)
    invb = jnp.full((ROWS, COLS), 1 / 128.0, jnp.float32)
    op_re = jax.device_put(
        rng.standard_normal((COLS, NDISP)).astype(np.float32), dev)
    op_im = jax.device_put(
        rng.standard_normal((COLS, NDISP)).astype(np.float32), dev)
    op_re16 = op_re.astype(jnp.bfloat16)
    op_im16 = op_im.astype(jnp.bfloat16)

    def scan_driver(group_fn):
        @jax.jit
        def run(all_in):
            return jax.lax.scan(lambda c, fr: (c, group_fn(fr)), 0, all_in)[1]
        return run

    def timeit(name, fn, *args):
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        for _ in range(3):
            out = fn(*args)
            jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        dt = (time.perf_counter() - t0) / (n * GROUPS)
        print(f"[{name}] {dt*1e3:.3f} ms/group", flush=True)
        return out

    # a) ratio elementwise only (reduce to keep output small)
    def ratio_only(fr):
        y = fr.astype(jnp.float32)
        yr = (y - pi) * invb
        return yr.sum()
    timeit("a_ratio_only", scan_driver(ratio_only), raw)

    # a2) widen only
    timeit("a2_widen_only", scan_driver(lambda fr: fr.astype(jnp.float32).sum()), raw)

    # b) matmuls only from f32 yr
    def mm_only(yr):
        re = yr @ op_re
        im = yr @ op_im
        return (re.sum(), im.sum())
    timeit("b_matmul_f32", scan_driver(mm_only), yr_all)

    # c) matmuls with bf16 operands
    def mm_bf16(yr):
        y16 = yr.astype(jnp.bfloat16)
        re = jnp.dot(y16, op_re16, preferred_element_type=jnp.float32)
        im = jnp.dot(y16, op_im16, preferred_element_type=jnp.float32)
        return (re.sum(), im.sum())
    timeit("c_matmul_bf16", scan_driver(mm_bf16), yr_all)

    # d) magnitude + batch accumulate from precomputed (B,rows,ndisp)
    rei = jax.device_put(
        rng.standard_normal((GROUPS, BATCH, ROWS, NDISP)).astype(np.float32), dev)
    def magacc(re):
        return jnp.sqrt(re * re + re * re).sum(axis=0)
    timeit("d_mag_accum", scan_driver(magacc), rei)

    # e) full group f32
    def full_f32(fr):
        y = fr.astype(jnp.float32)
        yr = (y - pi) * invb
        re = yr @ op_re
        im = yr @ op_im
        return jnp.sqrt(re * re + im * im).sum(axis=0)
    timeit("e_full_f32", scan_driver(full_f32), raw)

    # f) full group, matmul in bf16
    def full_bf16(fr):
        y = fr.astype(jnp.float32)
        yr = ((y - pi) * invb).astype(jnp.bfloat16)
        re = jnp.dot(yr, op_re16, preferred_element_type=jnp.float32)
        im = jnp.dot(yr, op_im16, preferred_element_type=jnp.float32)
        return jnp.sqrt(re * re + im * im).sum(axis=0)
    timeit("f_full_bf16", scan_driver(full_bf16), raw)

    # g) reshape batch into rows: one big matmul (B*rows, COLS) @ (COLS, NDISP)
    def full_flat(fr):
        y = fr.astype(jnp.float32)
        yr = ((y - pi) * invb).reshape(BATCH * ROWS, COLS)
        re = yr @ op_re
        im = yr @ op_im
        mag = jnp.sqrt(re * re + im * im)
        return mag.reshape(BATCH, ROWS, NDISP).sum(axis=0)
    timeit("g_full_flat", scan_driver(full_flat), raw)

    # h) complex-or-real: single matmul against stacked [op_re|op_im]
    op_cat = jnp.concatenate([op_re, op_im], axis=1)
    def full_cat(fr):
        y = fr.astype(jnp.float32)
        yr = ((y - pi) * invb).reshape(BATCH * ROWS, COLS)
        z = yr @ op_cat
        re, im = z[:, :NDISP], z[:, NDISP:]
        mag = jnp.sqrt(re * re + im * im)
        return mag.reshape(BATCH, ROWS, NDISP).sum(axis=0)
    timeit("h_full_cat", scan_driver(full_cat), raw)


if __name__ == "__main__":
    main()
