"""Dispersion-compensation phase correction.

The reference hardware setup compensates dispersion optically and has no
numerical dispersion correction; this op supplies the standard FD-OCT
numerical compensation (multiply the k-linear spectrum by exp(i·φ(k)) with a
polynomial phase) as a framework extension, plus an automatic coefficient
sweep that maximizes a B-scan sharpness metric — used by the volumetric
C-scan benchmark config ("512-frame volume assembly with dispersion sweep",
BASELINE.json).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dispersion_phase(klinear: jnp.ndarray, a2: float | jnp.ndarray,
                     a3: float | jnp.ndarray = 0.0) -> jnp.ndarray:
    """φ(k) = a2·(k-k̄)² + a3·(k-k̄)³ over the uniform k grid (normalized to
    the grid half-width so a2/a3 are O(1) radians at the band edge)."""
    kc = (klinear[0] + klinear[-1]) / 2
    half = (klinear[-1] - klinear[0]) / 2
    x = (klinear - kc) / half
    return a2 * x**2 + a3 * x**3


def apply_dispersion(spectrum: jnp.ndarray, phase: jnp.ndarray) -> jnp.ndarray:
    """Multiply a k-linear (real or complex) spectrum by exp(i·φ(k))."""
    cdtype = (jnp.complex128 if spectrum.dtype in (jnp.float64, jnp.complex128)
              else jnp.complex64)
    return spectrum.astype(cdtype) * jnp.exp(1j * phase.astype(cdtype))


def sharpness_metric(mag: jnp.ndarray) -> jnp.ndarray:
    """Normalized intensity-squared sharpness (higher = better focused).

    Standard autofocus metric for dispersion sweeps: Σ I² / (Σ I)² on the
    A-scan magnitudes.
    """
    i = mag.astype(jnp.float32) ** 2
    return jnp.sum(i * i) / (jnp.sum(i) ** 2 + 1e-30)


def dispersion_sweep(spectra: jnp.ndarray, klinear: jnp.ndarray,
                     a2_grid: jnp.ndarray, ndisp: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate the sharpness metric over a grid of a2 coefficients.

    ``spectra``: (rows, nfft) k-linear spectra.  Returns (scores, best_a2).
    vmapped over the coefficient grid; each trial is one batched IFFT.
    """
    n = spectra.shape[-1]

    def trial(a2):
        ph = dispersion_phase(klinear, a2)
        z = apply_dispersion(spectra, ph)
        mag = jnp.abs(jnp.fft.ifft(z, axis=-1))[..., :ndisp] * n
        return sharpness_metric(mag)

    scores = jax.vmap(trial)(a2_grid)
    return scores, a2_grid[jnp.argmax(scores)]
