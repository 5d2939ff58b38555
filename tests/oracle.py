"""Independent NumPy oracle for numerical parity testing.

Plays the role the Octave scripts play for the reference ("to check the
reconstruction done in C in BscanFFTsim.bin", Matlab files/wangOCTrec4.m):
a deliberately naive, loop-level NumPy transcription of the reference
*formulas* (cited per function), kept separate from the framework code so
that agreement is meaningful.  Everything is float64 and scalar-looped where
the reference loops.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# calibration (reference: BscanFFT.cpp:615-698)
# ---------------------------------------------------------------------------

def grids(lambdamin, lambdamax, opw, nfft, mult):
    deltalambda = (lambdamax - lambdamin) / opw
    n_in = opw * mult
    lambdas = np.array([lambdamin + i * deltalambda / mult for i in range(n_in)])
    k = 2 * np.pi / lambdas
    kmin = 2 * np.pi / (lambdamax - deltalambda)
    kmax = 2 * np.pi / lambdamin
    deltak = (kmax - kmin) / nfft
    klinear = np.array([kmin + (f + 1) * deltak for f in range(nfft)])
    diffk = np.zeros(n_in)
    for i in range(1, n_in):
        diffk[i] = k[i - 1] - k[i]
    diffk[0] = diffk[1]
    nearest = np.zeros(nfft, np.int64)
    for f in range(nfft):
        for i in range(n_in):                      # first-match linear search
            if k[i] < klinear[f]:
                nearest[f] = i
                break
    frac = np.zeros(nfft)
    for f in range(nfft):
        frac[f] = (klinear[f] - k[nearest[f]]) / diffk[nearest[f]]
    return dict(lambdas=lambdas, k=k, klinear=klinear, diffk=diffk,
                nearest=nearest, frac=frac)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def barthann(n):
    """reference: BscanFFT.cpp:936-944 (float32 ratio kept in f64)."""
    w = np.zeros(n)
    for p in range(n):
        x = p / (n - 1)
        w[p] = 0.62 - 0.48 * abs(x - 0.5) + 0.38 * np.cos(2 * np.pi * (x - 0.5))
    return w


def smoothmovavg(m, n):
    """reference: BscanFFT.cpp:247-304, literal loops."""
    rows, cols = m.shape
    out = np.zeros_like(m)
    for i in range(rows):
        for j in range(cols):
            s = 0.0
            for kk in range(-n, n + 1):
                idx = j + kk
                s += m[i, idx] if 0 <= idx < cols else m[i, j]
            s += m[i, j]
            out[i, j] = s / 2 / (n + 1)
    return out


def zeropadrowwise(m, sn, bandpass=False):
    """reference: BscanFFT.cpp:180-245 / BscanDark.cpp:169-254."""
    n = m.shape[1]
    big = n * sn
    F = np.fft.fft(m, axis=1) / n                  # DFT_SCALE forward
    F = np.fft.fftshift(F, axes=1)                 # hand-coded half swap
    if bandpass:
        tenth = n // 10
        F[:, : n // 2 - tenth] = 0
        F[:, n // 2 + tenth:] = 0
        F[:, n // 2 - 3: n // 2 + 3] = 0
    z = (big - n) // 2
    Fzp = np.pad(F, [(0, 0), (z, z)])
    Fzp = np.fft.ifftshift(Fzp, axes=1)
    return (np.fft.ifft(Fzp, axis=1) * big).real   # unnormalized inverse


def lpfilter(m):
    """reference: BscanDark.cpp:119-167."""
    n = m.shape[1]
    F = np.fft.fftshift(np.fft.fft(m, axis=1) / n, axes=1)
    tenth = n // 10
    F[:, : n // 2 - tenth] = 0
    F[:, n // 2 + tenth:] = 0
    return (np.fft.ifft(np.fft.ifftshift(F, axes=1), axis=1) * n).real


def klinear_interp(data_y, nearest, frac, nfft):
    """reference: BscanFFT.cpp:1150-1177, literal semantics incl. the
    fractionalk[nearest[q]] indexing and additive slope term."""
    rows, cols = data_y.shape
    slopes = np.zeros_like(data_y)
    for p in range(rows):
        for q in range(1, cols):
            slopes[p, q] = data_y[p, q] - data_y[p, q - 1]
        slopes[p, 0] = slopes[p, 1]
    ylin = np.zeros((rows, nfft))
    for p in range(rows):
        for q in range(1, nfft - 1):
            i = nearest[q]
            fi = frac[min(i, nfft - 1)]            # flat .at() indexing
            ylin[p, q] = data_y[p, i] + fi * slopes[p, i]
    return ylin


def ifft_mag(x):
    """reference: BscanFFT.cpp:1181-1190 — unnormalized row inverse DFT."""
    return np.abs(np.fft.ifft(x, axis=1)) * x.shape[1]


def bin_area(img, b):
    h, w = img.shape
    blocks = img.reshape(h // b, b, w // b, b).astype(np.float64)
    mean = blocks.mean(axis=(1, 3))
    if np.issubdtype(img.dtype, np.integer):
        return np.round(mean)
    return mean


# ---------------------------------------------------------------------------
# end-to-end single B-scan (BscanFFTsim semantics)
# ---------------------------------------------------------------------------

def bscan_pipeline(raw, backg, piimg, lambdamin, lambdamax, nfft, ndisp,
                   binvalue=1, mult=1, movavgn=0, averages=1,
                   normalize_input=False, bandpass=False):
    """Full oracle reconstruction of one averaged B-scan.

    Mirrors the sim hot loop (BscanFFTsim.cpp:770-1000): bin → f64 →
    [movavg] → [normalize] → ratio → DC-remove+window → [zeropad] →
    k-interp → |IFFT| → accumulate → transpose → ÷N → +1e-5 → dB →
    DC-row mask.
    """
    def prep(img):
        y = bin_area(img, binvalue) if binvalue > 1 else img.astype(np.float64)
        return y.astype(np.float64)

    # background/π frames are captured *after* binning in the reference
    # (data_yb accumulates the binned data_y, BscanFFT.cpp:1043), so they
    # arrive here already at (oph, opw)
    data_yb = backg.astype(np.float64)
    data_yp = piimg.astype(np.float64)
    y0 = prep(raw)
    if movavgn > 0:
        y0 = smoothmovavg(y0, movavgn)
    if normalize_input:
        lo, hi = y0.min(), y0.max()
        y0 = (y0 - lo) / (hi - lo) if hi > lo else np.zeros_like(y0)

    opw = y0.shape[1]
    g = grids(lambdamin, lambdamax, opw, nfft, mult)
    win = barthann(opw)

    yr = (y0 - data_yp) / data_yb
    for p in range(yr.shape[0]):
        yr[p] -= yr[p].mean()
        yr[p] *= win
    if mult > 1 or bandpass:
        yr = zeropadrowwise(yr, mult, bandpass)
    ylin = klinear_interp(yr, g["nearest"], g["frac"], nfft)
    mag = ifft_mag(ylin)[:, :ndisp]

    acc = mag * averages                           # identical frames summed
    bscan = acc.T / averages + 1e-5
    bscandb = 20.0 * np.log(bscan) / 2.303
    bscandb[1] = bscandb[4]
    bscandb[0] = bscandb[4]
    return dict(mag=mag, bscan=bscan, bscandb=bscandb, grids=g, window=win)
