"""Apodization windows.

The reference uses a modified Bartlett-Hann window built point-by-point in the
acquisition loop (reference: BscanFFT.cpp:936-944) and its Octave validation
scripts compare Tukey / Gaussian / Blackman-Harris windows
(reference: Matlab files/wangOCTrec3.m, wangOCTrec4.m).  All windows here are
length-N periodic-symmetric ("matlab symmetric") to match those formulas.
"""

from __future__ import annotations

import jax.numpy as jnp


def _ramp(n: int, dtype=None):
    """n/(N-1) in [0, 1], the MATLAB symmetric-window argument."""
    nn = jnp.arange(n, dtype=dtype)
    return nn / (n - 1) if n > 1 else jnp.zeros((n,), dtype)


def barthann(n: int, dtype=None) -> jnp.ndarray:
    """Modified Bartlett-Hann window.

    w(p) = 0.62 - 0.48*|p/(N-1) - 0.5| + 0.38*cos(2π(p/(N-1) - 0.5))
    reference: BscanFFT.cpp:936-944 (float32 intermediate ``nn/NN`` kept in
    float64 here; difference is below display tolerance).
    """
    x = _ramp(n, dtype) - 0.5
    return 0.62 - 0.48 * jnp.abs(x) + 0.38 * jnp.cos(2 * jnp.pi * x)


def hann(n: int, dtype=None) -> jnp.ndarray:
    x = _ramp(n, dtype)
    return 0.5 - 0.5 * jnp.cos(2 * jnp.pi * x)


def hamming(n: int, dtype=None) -> jnp.ndarray:
    x = _ramp(n, dtype)
    return 0.54 - 0.46 * jnp.cos(2 * jnp.pi * x)


def tukey(n: int, alpha: float = 0.5, dtype=None) -> jnp.ndarray:
    """Tapered-cosine window (compared in Matlab files/wangOCTrec3.m)."""
    if alpha <= 0:
        return jnp.ones((n,), dtype)
    if alpha >= 1:
        return hann(n, dtype)
    x = _ramp(n, dtype)
    left = 0.5 * (1 + jnp.cos(jnp.pi * (2 * x / alpha - 1)))
    right = 0.5 * (1 + jnp.cos(jnp.pi * (2 * x / alpha - 2 / alpha + 1)))
    w = jnp.ones((n,), dtype)
    w = jnp.where(x < alpha / 2, left, w)
    w = jnp.where(x >= 1 - alpha / 2, right, w)
    return w


def gaussian(n: int, sigma: float = 0.4, dtype=None) -> jnp.ndarray:
    """Gaussian window, σ relative to half-width (matlab gausswin style)."""
    half = (n - 1) / 2
    x = (jnp.arange(n, dtype=dtype) - half) / half if n > 1 else jnp.zeros((n,), dtype)
    return jnp.exp(-0.5 * (x / sigma) ** 2)


def blackmanharris(n: int, dtype=None) -> jnp.ndarray:
    """4-term Blackman-Harris (compared in Matlab files/wangOCTrec4.m)."""
    a0, a1, a2, a3 = 0.35875, 0.48829, 0.14128, 0.01168
    x = 2 * jnp.pi * _ramp(n, dtype)
    return a0 - a1 * jnp.cos(x) + a2 * jnp.cos(2 * x) - a3 * jnp.cos(3 * x)


_WINDOWS = {
    "barthann": barthann,
    "hann": hann,
    "hamming": hamming,
    "tukey": tukey,
    "gaussian": gaussian,
    "blackmanharris": blackmanharris,
    "rect": lambda n, dtype=None: jnp.ones((n,), dtype),
}


def get_window(kind: str, n: int, dtype=None, **kw) -> jnp.ndarray:
    """Window factory; ``kind`` is one of ``fdoct_tpu.ops.windows._WINDOWS``."""
    try:
        fn = _WINDOWS[kind]
    except KeyError:
        raise ValueError(f"unknown window {kind!r}; have {sorted(_WINDOWS)}") from None
    return fn(n, dtype=dtype, **kw)
