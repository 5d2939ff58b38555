"""wangOCT four-panel estimator comparison (Matlab files/wangOCT.m:20-59).

The textbook deconvolved / differential IFT estimators (ops.wang) must
reproduce the chapter's physics on the simulated two-scatterer fixture:
peaks at the scatterer depths, DC + autocorrelation terms cancelled by the
differential form, envelope flattened by the deconvolution.
"""

import numpy as np
import pytest

from fdoct_tpu.ops.wang import (
    deconvolved_ift, depth_axis, differential_deconvolved_ift,
    ift_reflectivity, wang_interferogram_pair)

NS = 1.38
LS1, LS2 = 90e-6, 150e-6


@pytest.fixture(scope="module")
def fixture():
    I1, I2, S, sigma_k = wang_interferogram_pair(
        depths_m=(LS1, LS2), reflectivities=(0.5, 0.25), ns=NS)
    ls = depth_axis(len(S), sigma_k, ns=NS)
    return I1, I2, S, ls


def _peak_depth(spec, ls, lo, hi):
    """Depth of the largest peak with lo < |ls| < hi (positive branch)."""
    sel = (ls > lo) & (ls < hi)
    idx = np.flatnonzero(sel)
    return ls[idx[np.argmax(np.asarray(spec)[idx])]]


def test_plain_ift_finds_scatterers_plus_dc(fixture):
    I1, _, _, ls = fixture
    spec = np.asarray(ift_reflectivity(I1))
    dbin = ls[1] - ls[0]
    # panel 2: dominant DC peak at zero depth plus the two scatterers
    assert abs(ls[np.argmax(spec)]) < dbin
    assert abs(_peak_depth(spec, ls, 60e-6, 120e-6) - LS1) < 2 * dbin
    assert abs(_peak_depth(spec, ls, 120e-6, 200e-6) - LS2) < 2 * dbin


def test_deconvolved_ift_sharpens_peaks(fixture):
    I1, _, S, ls = fixture
    plain = np.asarray(ift_reflectivity(I1))
    deconv = np.asarray(deconvolved_ift(I1, S))
    dbin = ls[1] - ls[0]
    assert abs(_peak_depth(deconv, ls, 60e-6, 120e-6) - LS1) < 2 * dbin

    def fwhm_bins(spec):
        sel = (ls > 60e-6) & (ls < 120e-6)
        s = spec[sel]
        return np.count_nonzero(s > s.max() / 2)

    # panel 3: deconvolution flattens the coherence envelope — the axial
    # point spread narrows (sinc-like) vs the Gaussian-windowed panel 2
    assert fwhm_bins(deconv) < fwhm_bins(plain)


def test_differential_cancels_dc_and_autocorrelation(fixture):
    I1, I2, S, ls = fixture
    deconv = np.asarray(deconvolved_ift(I1, S))
    diff = np.asarray(differential_deconvolved_ift(I1, I2, S))
    dbin = ls[1] - ls[0]
    # panel 4: the scatterer cross terms survive ...
    assert abs(_peak_depth(diff, ls, 60e-6, 120e-6) - LS1) < 2 * dbin
    assert abs(_peak_depth(diff, ls, 120e-6, 200e-6) - LS2) < 2 * dbin
    peak = diff.max()
    # ... while the source DC term cancels (I1 - I2 = 4·S·Re(E) has no DC
    # component; what remains at depth 0 is finite-grid spectral leakage
    # from the scatterer lines, ~1% — the reference's panels show the same
    # floor).  The plain deconvolved estimator is DC-DOMINATED.
    dc_sel = np.abs(ls) < 2 * dbin
    assert deconv[dc_sel].max() == np.asarray(deconv).max()
    assert diff[dc_sel].max() < 0.01 * peak
    # ... and the r1·r2 autocorrelation peak at ls2-ls1 = 60 µm (a real
    # term of |E|² in I1 alone) is strongly suppressed relative to the
    # non-differential deconvolved estimator
    auto_sel = np.abs(np.abs(ls) - (LS2 - LS1)) < 2 * dbin
    assert deconv[auto_sel].max() > 0.05 * deconv.max()
    assert (diff[auto_sel].max() / peak
            < deconv[auto_sel].max() / deconv.max() / 3.0)


def test_batched_rows_match_single(fixture):
    I1, I2, S, _ = fixture
    stack = np.stack([I1, 2.0 * I1])
    got = np.asarray(differential_deconvolved_ift(stack, np.stack([I2, 2 * I2]),
                                                  S))
    one = np.asarray(differential_deconvolved_ift(I1, I2, S))
    np.testing.assert_allclose(got[0], one, rtol=1e-12)
    np.testing.assert_allclose(got[1], 2.0 * one, rtol=1e-12)


def test_depth_axis_odd_n_matches_fftshift_order():
    """Odd sample counts: fftshift orders bins -(n-1)/2 .. (n-1)/2; the
    depth axis must line up (a single pure tone lands on its own bin)."""
    for n in (15, 16):
        ax = depth_axis(n, sigma_k=1.0, nsigma=0.5, ns=1.0)
        # e^{+i2π·3k/n} lands on ifft bin -3 (numpy ifft kernel e^{+i...})
        k = np.arange(n)
        tone = np.exp(1j * 2 * np.pi * 3 * k / n)
        spec = np.abs(np.fft.fftshift(np.fft.ifft(tone)))
        dbin = ax[1] - ax[0]
        got = ax[int(np.argmax(spec))]
        assert abs(got + 3 * dbin) < 1e-12 * abs(3 * dbin)
