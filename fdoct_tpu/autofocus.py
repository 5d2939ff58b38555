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
