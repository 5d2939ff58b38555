"""C-scan volume analysis: en-face projections, surface topography,
per-A-scan peaks.

The reference never assembles volumes (it saves B-scan stacks for offline
MATLAB work); these are the standard volumetric views that workflow needs,
computed on-device over (F, depth, lateral) arrays.
"""

from __future__ import annotations

import jax.numpy as jnp


def ascan_peaks(bscan: jnp.ndarray, dc_rows: int = 5):
    """Per-A-scan peak depth and value of a (depth, lateral) B-scan with
    the DC rows excluded (the display masks rows 0-4, BscanFFT.cpp:1239).

    Returns (depth_idx (lateral,), value (lateral,)).
    """
    body = bscan[..., dc_rows:, :]
    idx = jnp.argmax(body, axis=-2) + dc_rows
    val = jnp.max(body, axis=-2)
    return idx, val


def enface_projection(volume: jnp.ndarray, mode: str = "max",
                      depth_range: tuple[int, int] | None = None,
                      dc_rows: int = 5) -> jnp.ndarray:
    """En-face view of a (F, depth, lateral) volume: reduce over depth.

    mode: 'max' (maximum-intensity projection), 'mean' (integrated), or
    'sum'.  ``depth_range`` restricts the slab; DC rows excluded by default.
    Returns (F, lateral).
    """
    lo, hi = depth_range if depth_range is not None else (dc_rows,
                                                         volume.shape[-2])
    slab = volume[..., lo:hi, :]
    if mode == "max":
        return jnp.max(slab, axis=-2)
    if mode == "mean":
        return jnp.mean(slab, axis=-2)
    if mode == "sum":
        return jnp.sum(slab, axis=-2)
    raise ValueError(f"unknown mode {mode!r}")


def surface_map(volume: jnp.ndarray, threshold_frac: float = 0.5,
                dc_rows: int = 5) -> jnp.ndarray:
    """Surface topography: per (frame, lateral) position, the first depth
    whose intensity exceeds ``threshold_frac`` of that A-scan's peak.
    Returns (F, lateral) depth indices."""
    body = volume[..., dc_rows:, :]
    peak = jnp.max(body, axis=-2, keepdims=True)
    above = body >= threshold_frac * peak
    first = jnp.argmax(above, axis=-2)  # first True along depth
    return first + dc_rows
