"""Dispersion autofocus: sweep compensation coefficients over a volume.

No reference equivalent (its dispersion is balanced optically); this is the
numerical dispersion workflow of the BASELINE.md volumetric config
("512-frame volume assembly with dispersion sweep"): evaluate a grid of
second/third-order phase coefficients on sample A-scans, score each
reconstruction with a sharpness metric, and rebuild the fused operator with
the winner.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from fdoct_tpu.calibration import Calibration
from fdoct_tpu.config import PipelineConfig
from fdoct_tpu.ops.dispersion import (
    apply_dispersion, dispersion_phase, sharpness_metric)
from fdoct_tpu.pipeline import apodize_ratio, linearize, preprocess


def sweep_volume(frames: jnp.ndarray, background: jnp.ndarray,
                 pi_frame: jnp.ndarray, calib: Calibration,
                 cfg: PipelineConfig, a2_grid: jnp.ndarray,
                 sample_rows: int = 32) -> tuple[np.ndarray, float]:
    """Score each a2 candidate on a row subsample of the volume.

    The k-linear spectra are computed once (the expensive part); each
    candidate then costs one phase multiply + IFFT over the subsample.
    Returns (scores, best_a2).
    """
    f = frames.reshape(-1, frames.shape[-2], frames.shape[-1])
    y = preprocess(f[0], cfg)
    yr = apodize_ratio(y, background, pi_frame, cfg)
    ylin = linearize(yr, calib)[:sample_rows]
    n = ylin.shape[-1]

    def trial(a2):
        ph = dispersion_phase(calib.klinear, a2)
        z = apply_dispersion(ylin, ph)
        mag = jnp.abs(jnp.fft.ifft(z, axis=-1))[..., : calib.ndisp] * n
        return sharpness_metric(mag)

    scores = jax.jit(jax.vmap(trial))(a2_grid)
    best = float(a2_grid[int(jnp.argmax(scores))])
    return np.asarray(scores), best


def sweep_volume_2d(frames: jnp.ndarray, background: jnp.ndarray,
                    pi_frame: jnp.ndarray, calib: Calibration,
                    cfg: PipelineConfig, a2_grid: jnp.ndarray,
                    a3_grid: jnp.ndarray, sample_rows: int = 32
                    ) -> tuple[np.ndarray, float, float]:
    """Joint (a2, a3) sweep: second- plus third-order compensation.

    Returns (scores[len(a2), len(a3)], best_a2, best_a3).  Same
    compute-spectra-once strategy as :func:`sweep_volume`.
    """
    f = frames.reshape(-1, frames.shape[-2], frames.shape[-1])
    y = preprocess(f[0], cfg)
    yr = apodize_ratio(y, background, pi_frame, cfg)
    ylin = linearize(yr, calib)[:sample_rows]
    n = ylin.shape[-1]

    def trial(a2, a3):
        ph = dispersion_phase(calib.klinear, a2, a3)
        z = apply_dispersion(ylin, ph)
        mag = jnp.abs(jnp.fft.ifft(z, axis=-1))[..., : calib.ndisp] * n
        return sharpness_metric(mag)

    scores = jax.jit(jax.vmap(jax.vmap(trial, in_axes=(None, 0)),
                              in_axes=(0, None)))(a2_grid, a3_grid)
    i, j = np.unravel_index(int(jnp.argmax(scores)), scores.shape)
    return (np.asarray(scores), float(a2_grid[i]), float(a3_grid[j]))


def autofocused_calibration(cfg: PipelineConfig, best_a2: float,
                            best_a3: float = 0.0) -> Calibration:
    """Rebuild the fused operator with the winning coefficients folded in
    (one host-side rebuild; the per-frame cost is unchanged)."""
    return Calibration.create(cfg.replace(dispersion_a2=best_a2,
                                          dispersion_a3=best_a3))


def segmented_dispersion_mags(yr: jnp.ndarray, calib: Calibration,
                              a2_per_segment: jnp.ndarray) -> jnp.ndarray:
    """Depth-segmented dispersion compensation.

    Sample dispersion grows with depth (light traverses more material), so
    one global coefficient can only focus one depth; this reconstructs the
    k-linear spectrum once, applies each segment's phase, and stitches each
    segment's depth window from its own compensated IFFT.

    ``a2_per_segment`` (S,) splits the display depth range into S equal
    segments.  Cost: S phase-multiplies + IFFTs over the row batch (the
    spectra are computed once).  Returns (..., ndisp) magnitudes.
    """
    ylin = linearize(yr, calib)
    n = ylin.shape[-1]
    S = a2_per_segment.shape[0]
    seg_len = calib.ndisp // S
    assert seg_len * S == calib.ndisp, (calib.ndisp, S)

    def one(a2):
        ph = dispersion_phase(calib.klinear, a2)
        z = apply_dispersion(ylin, ph)
        return jnp.abs(jnp.fft.ifft(z, axis=-1))[..., : calib.ndisp] * n

    mags = jax.vmap(one)(a2_per_segment)          # (S, ..., ndisp)
    segments = [mags[s][..., s * seg_len:(s + 1) * seg_len]
                for s in range(S)]
    return jnp.concatenate(segments, axis=-1)


def sweep_per_segment(yr: jnp.ndarray, calib: Calibration,
                      a2_grid: jnp.ndarray, n_segments: int) -> jnp.ndarray:
    """Per-segment coefficient sweep: for each depth segment, pick the a2
    maximizing that segment's sharpness.  Returns (n_segments,) best a2s."""
    ylin = linearize(yr, calib)
    n = ylin.shape[-1]
    seg_len = calib.ndisp // n_segments

    def trial(a2):
        ph = dispersion_phase(calib.klinear, a2)
        z = apply_dispersion(ylin, ph)
        mag = jnp.abs(jnp.fft.ifft(z, axis=-1))[..., : calib.ndisp] * n
        segs = mag.reshape(*mag.shape[:-1], n_segments, seg_len)
        i = segs.astype(jnp.float32) ** 2
        red = tuple(range(i.ndim - 2)) + (i.ndim - 1,)
        return jnp.sum(i * i, axis=red) / (jnp.sum(i, axis=red) ** 2 + 1e-30)

    scores = jax.jit(jax.vmap(trial))(a2_grid)    # (len(grid), n_segments)
    return a2_grid[jnp.argmax(scores, axis=0)]
