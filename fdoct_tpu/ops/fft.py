"""Row-wise Fourier ops: spectral zero-pad upsampling, low-pass/band-pass
filtering, and the inverse-FFT magnitude core.

reference: zeropadrowwise (BscanFFT.cpp:180-245; band-pass variant
BscanDark.cpp:169-254), lpfilter (BscanDark.cpp:119-167), and the
merge→dft(DFT_ROWS|DFT_INVERSE)→magnitude core (BscanFFT.cpp:1181-1190).

Conventions matched exactly:
- OpenCV forward dft with DFT_SCALE divides by n; the inverse dft without
  DFT_SCALE is unnormalized (sums, no 1/N).  All scale factors below follow
  from that pairing.
- fftshift/ifftshift are the even-length half-swaps the reference hand-codes.

All functions operate on the last axis and accept leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def _fftshift(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.roll(x, x.shape[-1] // 2, axis=-1)


def _ifftshift(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.roll(x, -(x.shape[-1] // 2), axis=-1)


def _bandpass_blank(spec_shifted: jnp.ndarray, keep_tenth: bool = True,
                    blank_dc: int = 0) -> jnp.ndarray:
    """Blank the outer 80% of a centred (fftshifted) spectrum, keeping the
    centre ±floor(n/10) bins; optionally also blank ±blank_dc bins around DC.

    reference: BscanDark.cpp:218-236 (band-pass inside zeropadrowwise blanks
    with dcvals=3) and BscanDark.cpp:143-151 (lpfilter, no DC blank).
    """
    n = spec_shifted.shape[-1]
    tenth = n // 10
    dcl = n // 2 - tenth
    dcr = n // 2 + tenth
    idx = jnp.arange(n)
    keep = (idx >= dcl) & (idx < dcr) if keep_tenth else jnp.ones(n, bool)
    if blank_dc > 0:
        keep = keep & ~((idx >= n // 2 - blank_dc) & (idx < n // 2 + blank_dc))
    return jnp.where(keep, spec_shifted, 0.0)


def zeropad_rowwise(x: jnp.ndarray, mult: int,
                    bandpassfilter: bool = False) -> jnp.ndarray:
    """Sinc-interpolated row upsampling by Fourier zero-padding.

    fft/n → fftshift → [band-pass blank] → pad (N-n)/2 zeros each side →
    ifftshift → unnormalized inverse fft, real part; N = n*mult.  Identical
    math to reference zeropadrowwise (BscanFFT.cpp:180-245; band-pass variant
    BscanDark.cpp:169-254).  Amplitude-preserving: the /n forward scale and
    the unnormalized ×N inverse give a net ×mult that exactly cancels the
    1/mult sample-density change.
    """
    if mult <= 1 and not bandpassfilter:
        return x
    n = x.shape[-1]
    big = n * mult
    cdtype = jnp.complex128 if x.dtype == jnp.float64 else jnp.complex64
    spec = jnp.fft.fft(x.astype(cdtype), axis=-1) / n
    spec = _fftshift(spec)
    if bandpassfilter:
        spec = _bandpass_blank(spec, keep_tenth=True, blank_dc=3)
    z = (big - n) // 2
    if z:
        pad = [(0, 0)] * (x.ndim - 1) + [(z, z)]
        spec = jnp.pad(spec, pad)
    spec = _ifftshift(spec)
    out = jnp.fft.ifft(spec, axis=-1).real * spec.shape[-1]
    return out.astype(x.dtype)


def lowpass_rowwise(x: jnp.ndarray) -> jnp.ndarray:
    """FFT low-pass keeping the centred ±10% of each row's spectrum
    (reference: lpfilter, BscanDark.cpp:119-167)."""
    n = x.shape[-1]
    cdtype = jnp.complex128 if x.dtype == jnp.float64 else jnp.complex64
    spec = jnp.fft.fft(x.astype(cdtype), axis=-1) / n
    spec = _bandpass_blank(_fftshift(spec), keep_tenth=True, blank_dc=0)
    out = jnp.fft.ifft(_ifftshift(spec), axis=-1).real * n
    return out.astype(x.dtype)


def ifft_mag_rows(x: jnp.ndarray, phase: jnp.ndarray | None = None) -> jnp.ndarray:
    """Row-wise unnormalized inverse DFT magnitude.

    |IDFT(x)| with OpenCV's unnormalized inverse (= n·|np.ifft|), matching
    merge→dft(DFT_ROWS|DFT_INVERSE)→magnitude (reference:
    BscanFFT.cpp:1181-1190).  ``phase`` optionally applies a complex
    dispersion-compensation factor exp(iφ(k)) before the transform
    (no reference equivalent; see ops.dispersion).
    """
    n = x.shape[-1]
    cdtype = jnp.complex128 if x.dtype == jnp.float64 else jnp.complex64
    z = x.astype(cdtype)
    if phase is not None:
        z = z * jnp.exp(1j * phase.astype(cdtype))
    return jnp.abs(jnp.fft.ifft(z, axis=-1)).astype(x.dtype) * n
