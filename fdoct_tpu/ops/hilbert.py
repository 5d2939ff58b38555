"""Hilbert-phase alternative reconstruction.

The reference's Octave validation compares the standard IFFT reconstruction
against a Hilbert/analytic-signal phase method
(Matlab files/wangOCTrec4.m:8-12, 128-171): the analytic signal of the
(log-magnitude-processed) k-linear spectrum supplies the phase used to form
the complex fringe before the inverse transform.  Provided here as an
alternative estimator on the same jit pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp


def analytic_signal(x: jnp.ndarray) -> jnp.ndarray:
    """Row-wise analytic signal (scipy.signal.hilbert semantics): zero the
    negative frequencies, double the positive ones."""
    n = x.shape[-1]
    cdtype = jnp.complex128 if x.dtype == jnp.float64 else jnp.complex64
    spec = jnp.fft.fft(x.astype(cdtype), axis=-1)
    h = jnp.zeros(n)
    if n % 2 == 0:
        h = h.at[0].set(1.0).at[n // 2].set(1.0).at[1:n // 2].set(2.0)
    else:
        h = h.at[0].set(1.0).at[1:(n + 1) // 2].set(2.0)
    return jnp.fft.ifft(spec * h, axis=-1)


def hilbert_reconstruct(ylin: jnp.ndarray, ndisp: int) -> jnp.ndarray:
    """Analytic-signal A-scan estimator on k-linear fringes.

    Forms the complex fringe via the analytic signal (instantaneous phase of
    the interference term) and returns |IFFT| magnitudes truncated to
    ``ndisp`` depth samples, scaled like ops.fft.ifft_mag_rows.  Mirrors the
    role of the Hilbert method in wangOCTrec4.m (an independent estimator to
    cross-check the direct IFFT path), not its literal Octave code.

    The conjugate is taken before the inverse transform: under the ifft
    convention the displayed positive-depth bins carry the *negative*
    spectral branch (see ops/dispersion.py note), which the analytic signal
    would otherwise suppress.
    """
    n = ylin.shape[-1]
    z = jnp.conj(analytic_signal(ylin))
    return jnp.abs(jnp.fft.ifft(z, axis=-1))[..., :ndisp].astype(ylin.dtype) * n
