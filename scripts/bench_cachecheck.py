#!/usr/bin/env python
"""Check whether the dev tunnel memoizes identical executions: time the same
jitted fn with (a) the SAME input every call vs (b) DISTINCT inputs."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    f = jax.jit(lambda x: x.sum())

    same = jax.device_put(rng.standard_normal((8192, 8192)).astype(np.float32), dev)
    many = [jax.device_put(rng.standard_normal((8192, 8192)).astype(np.float32), dev)
            for _ in range(8)]

    f(same).block_until_ready()
    for m in many:
        f(m).block_until_ready()

    n = 16
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(same)
    out.block_until_ready()
    dt_same = (time.perf_counter() - t0) / n
    print(f"same input : {dt_same*1e3:.3f} ms -> {same.nbytes/dt_same/1e9:.0f} GB/s")

    t0 = time.perf_counter()
    for i in range(n):
        out = f(many[i % len(many)])
    out.block_until_ready()
    dt_many = (time.perf_counter() - t0) / n
    print(f"distinct   : {dt_many*1e3:.3f} ms -> {same.nbytes/dt_many/1e9:.0f} GB/s")

    # matmul check with distinct inputs
    mm = jax.jit(lambda x, y: x @ y)
    a = [jax.device_put(rng.standard_normal((4096, 4096)).astype(np.float32), dev)
         for _ in range(4)]
    for i in range(4):
        mm(a[i], a[(i + 1) % 4]).block_until_ready()
    t0 = time.perf_counter()
    for i in range(n):
        out = mm(a[i % 4], a[(i + 1) % 4])
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n
    print(f"matmul distinct: {dt*1e3:.3f} ms -> {2*4096**3/dt/1e12:.1f} TFLOP/s")

    t0 = time.perf_counter()
    for i in range(n):
        out = mm(a[0], a[1])
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n
    print(f"matmul same    : {dt*1e3:.3f} ms -> {2*4096**3/dt/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
