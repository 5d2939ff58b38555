"""Shared harness for the interleaved TPU A/B benchmark scripts.

ONE implementation of the repo's honest-timing machinery (bench.py
docstring: scalar-fetch completion, differenced scan lengths, on-device
frame generation, interleaved sampling so every variant sees the same
shared-chip load window) — bench_epilogue_fuse.py / bench_rank2.py import
from here instead of copy-pasting it.
"""
from __future__ import annotations

import functools
import time

import numpy as np


def make_generators(batch: int, rows: int, cols: int):
    """(gen_s8, gen_u8): jitted on-device frame-batch generators for scan
    length g — the tunnel never touches the timed path."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=0)
    def gen_s8(g):
        return (jax.random.randint(
            jax.random.PRNGKey(0), (g, batch, rows, cols), 0, 255,
            jnp.int32) - 128).astype(jnp.int8)

    @functools.partial(jax.jit, static_argnums=0)
    def gen_u8(g):
        return jax.random.randint(
            jax.random.PRNGKey(0), (g, batch, rows, cols), 0, 255,
            jnp.int32).astype(jnp.uint8)

    return gen_s8, gen_u8


def scan_of(group_fn):
    """jit a per-group fn into the scan-chained live-streaming shape with a
    scalar carry (nothing dead-code-eliminated; the final float() fetch
    forces true completion through the tunnel)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(all_fr):
        def step(c, fr):
            return c + group_fn(fr).sum(), 0.0
        return jax.lax.scan(step, jnp.float32(0), all_fr)[0]
    return run


def interleaved_measure(variants, g1: int, g2: int, repeats: int,
                        batch: int, rows: int):
    """Time ``variants`` = [(name, jitted_run, gen_fn)] interleaved.

    Generates/warms every (gen, g) buffer and compiles every variant
    first; then each repeat sweep takes ONE sample of every variant at
    both scan lengths back-to-back, so all differenced ratios share the
    load window.  Prints per-variant ms/group; returns {name: per_group_s}
    (variants with inconsistent differenced timings map to None and are
    flagged on stdout instead of reporting nonsense).
    """
    frames = {}
    for _, _, gen in variants:
        for g in (g1, g2):
            if (gen, g) not in frames:
                frames[(gen, g)] = gen(g)
                frames[(gen, g)].block_until_ready()
    for name, run, gen in variants:
        t0 = time.perf_counter()
        float(run(frames[(gen, g1)]))
        float(run(frames[(gen, g2)]))
        print(f"[{name}] compiled in {time.perf_counter()-t0:.1f}s",
              flush=True)

    samples = {name: {g1: [], g2: []} for name, _, _ in variants}
    for _ in range(repeats):
        for g in (g1, g2):
            for name, run, gen in variants:
                t0 = time.perf_counter()
                float(run(frames[(gen, g)]))
                samples[name][g].append(time.perf_counter() - t0)

    pers = {}
    for name, _, _ in variants:
        s1, s2 = samples[name][g1], samples[name][g2]
        t1, t2 = float(np.median(s1)), float(np.median(s2))
        # two unusable-window signatures (both observed on the shared dev
        # chip): non-monotone medians, and a mid-sweep load shift that
        # leaves one length's samples swinging wildly — the ordering guard
        # alone once let a physically impossible 334 M A-scans/s row
        # through (the medians straddled the shift).  Ordering is checked
        # FIRST so a degenerate all-zero sample list cannot reach the
        # spread division.
        if not (t2 > t1 > 0):
            print(f"[{name}] INCONSISTENT window: t({g1})={t1:.4f}s "
                  f"t({g2})={t2:.4f}s — row skipped", flush=True)
            pers[name] = None
            continue
        spread = max((max(s) - min(s)) / float(np.median(s))
                     for s in (s1, s2))
        if spread > 0.5:
            print(f"[{name}] INCONSISTENT window: sample spread "
                  f"{spread*100:.0f}% (mid-sweep load shift) — row "
                  f"skipped", flush=True)
            pers[name] = None
            continue
        per = (t2 - t1) / (g2 - g1)
        pers[name] = per
        print(f"[{name}] {per*1e3:.3f} ms/group = "
              f"{batch*rows/per/1e6:.2f} M ascans/s", flush=True)
    return pers
