"""Doppler / phase-resolved OCT.

No reference equivalent (the reference discards phase at
BscanFFT.cpp:1190); built on the fused path's complex A-scans
(pipeline.ascan_complex).  Standard phase-resolved processing: the
frame-to-frame phase difference at each voxel measures axial displacement
Δz = Δφ·λ0/(4π·n_s) per inter-frame interval, i.e. axial velocity.
"""

from __future__ import annotations

import jax.numpy as jnp

from fdoct_tpu.calibration import Calibration
from fdoct_tpu.config import PipelineConfig
from fdoct_tpu.pipeline import apodize_ratio, ascan_complex, preprocess


def phase_difference(z_prev: jnp.ndarray, z_curr: jnp.ndarray) -> jnp.ndarray:
    """Wrapped per-voxel phase change Δφ ∈ (−π, π] between two complex
    A-scan fields (angle of the Kasai autocorrelation)."""
    return jnp.angle(z_curr * jnp.conj(z_prev))


def displacement_m(dphi: jnp.ndarray, lambda0: float, ns: float = 1.0) -> jnp.ndarray:
    """Δz = Δφ·λ0 / (4π·n_s) — double-pass axial displacement."""
    return dphi * lambda0 / (4 * jnp.pi * ns)


def speckle_variance(z: jnp.ndarray) -> jnp.ndarray:
    """Speckle-variance OCT-A: inter-frame variance of the A-scan magnitude
    at each voxel of a (T, H, ndisp) complex stack — high where scatterers
    decorrelate (flow), low in static tissue."""
    mag = jnp.abs(z)
    return jnp.var(mag, axis=0)


def octa_bscan(raw_frames: jnp.ndarray, background: jnp.ndarray,
               pi_frame: jnp.ndarray, calib: Calibration,
               cfg: PipelineConfig, mag_floor_frac: float = 0.1):
    """Angiography B-scan: (mean_mag (ndisp, H), normalized speckle-variance
    map (ndisp, H)) from a repeated-frame sequence."""
    y = preprocess(raw_frames, cfg)
    yr = apodize_ratio(y, background, pi_frame, cfg)
    z = ascan_complex(yr, calib)
    mag = jnp.mean(jnp.abs(z), axis=0)
    sv = speckle_variance(z) / (mag**2 + 1e-20)   # contrast-normalized
    mask = mag > mag_floor_frac * jnp.max(mag)
    return mag.T, jnp.where(mask, sv, 0.0).T


def doppler_bscan(raw_frames: jnp.ndarray, background: jnp.ndarray,
                  pi_frame: jnp.ndarray, calib: Calibration,
                  cfg: PipelineConfig, ns: float = 1.0,
                  mag_floor_frac: float = 0.1):
    """Doppler B-scan from a (T, H, W) frame sequence.

    Returns (mean_mag (ndisp, H), velocity_map (ndisp, H)) where the
    velocity map is the magnitude-weighted mean inter-frame displacement in
    meters per frame interval; voxels below ``mag_floor_frac`` of the peak
    magnitude are masked to 0 (phase is noise there).
    """
    y = preprocess(raw_frames, cfg)
    yr = apodize_ratio(y, background, pi_frame, cfg)
    z = ascan_complex(yr, calib)                  # (T, H, ndisp)
    # Kasai estimator: magnitude-weighted mean of z_t · conj(z_{t-1})
    corr = jnp.sum(z[1:] * jnp.conj(z[:-1]), axis=0)
    dphi = jnp.angle(corr)
    # the displayed positive-depth peak is the conjugate fringe branch
    # under the ifft convention (see ops/dispersion.py note), so its phase
    # runs backwards; negate so positive velocity = increasing depth
    disp = -displacement_m(dphi, cfg.lambda0, ns)
    mag = jnp.mean(jnp.abs(z), axis=0)
    mask = mag > mag_floor_frac * jnp.max(mag)
    return mag.T, jnp.where(mask, disp, 0.0).T    # (ndisp, H) layouts
