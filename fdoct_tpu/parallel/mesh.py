"""Device-mesh construction helpers."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_data: int | None = None, n_ascan: int | None = None,
              devices=None) -> Mesh:
    """Build a ('data', 'ascan') mesh.

    Default splits all devices across 'data' (frame parallelism); pass
    ``n_ascan`` to dedicate devices to the lateral A-scan axis of each
    B-scan (sequence-parallel analog).  ``n_data * n_ascan`` must cover the
    device count.
    """
    devices = list(jax.devices() if devices is None else devices)
    n = len(devices)
    if n_data is None and n_ascan is None:
        n_data, n_ascan = n, 1
    elif n_data is None:
        n_data = n // n_ascan
    elif n_ascan is None:
        n_ascan = n // n_data
    if n_data * n_ascan != n:
        raise ValueError(f"mesh {n_data}x{n_ascan} != {n} devices")
    grid = np.asarray(devices).reshape(n_data, n_ascan)
    return Mesh(grid, ("data", "ascan"))
