"""End-to-end pipeline tests: oracle parity and physics correctness.

The physics test is the moral equivalent of the reference's validation story
(SURVEY.md §4): synthesize interferograms with scatterers at known depths
(wangOCTimg2.m model) and check the reconstructed B-scan peaks land at the
right depth bins.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fdoct_tpu.calibration import Calibration
from fdoct_tpu.config import PipelineConfig
from fdoct_tpu.pipeline import form_bscan, reconstruct, reconstruct_bscan
from fdoct_tpu.sources.synthetic import (
    SyntheticSource, interferogram, source_psd, wang_lambda_grid)
import oracle


@pytest.fixture(scope="module")
def sim_cfg():
    """Scaled-down BscanFFTsim configuration (λ range from wangOCTimg2)."""
    return PipelineConfig(
        width=256, height=32, binvalue=1, averages=1,
        numfftpoints=512, numdisplaypoints=160,
        lambdamin=816e-9, lambdamax=884e-9,
        increasefftpointsmultiplier=1, mediann=0, movavgn=0,
        donotnormalize=True, dtype="float64", compat=True,
    )


@pytest.fixture(scope="module")
def sim_frames(sim_cfg):
    src = SyntheticSource(height=sim_cfg.height, width=sim_cfg.width,
                          depths_um=(40.0, 80.0), noise=0.0)
    raw = next(iter(src.frames()))
    return raw, src.background(), src.pi_frame()


class TestOracleParity:
    @pytest.mark.parametrize("method", ["gather", "fused"])
    def test_single_frame_matches_oracle(self, sim_cfg, sim_frames, method):
        raw, backg, piimg = sim_frames
        calib = Calibration.create(sim_cfg)
        got = np.asarray(reconstruct(
            jnp.asarray(raw), jnp.asarray(backg, jnp.float64),
            jnp.asarray(piimg, jnp.float64), calib, sim_cfg, method=method))
        want = oracle.bscan_pipeline(
            raw, backg, piimg, sim_cfg.lambdamin, sim_cfg.lambdamax,
            sim_cfg.numfftpoints, sim_cfg.numdisplaypoints)["mag"]
        tol = 1e-9 if method == "gather" else 1e-7
        assert got.shape == want.shape
        assert np.allclose(got, want, rtol=tol, atol=tol * want.max())

    def test_with_zeropad_and_binning(self, rng):
        cfg = PipelineConfig(
            width=128, height=16, binvalue=2, numfftpoints=256,
            numdisplaypoints=80, increasefftpointsmultiplier=2,
            dtype="float64", compat=True)
        calib = Calibration.create(cfg)
        raw = rng.integers(0, 255, size=(cfg.height, cfg.width)).astype(np.uint8)
        backg = np.full((cfg.oph, cfg.opw), 100.0)
        piimg = np.zeros((cfg.oph, cfg.opw))
        got = np.asarray(reconstruct(
            jnp.asarray(raw), jnp.asarray(backg), jnp.asarray(piimg),
            calib, cfg, method="gather"))
        want = oracle.bscan_pipeline(
            raw, backg, piimg, cfg.lambdamin, cfg.lambdamax,
            cfg.numfftpoints, cfg.numdisplaypoints,
            binvalue=2, mult=2)["mag"]
        assert np.allclose(got, want, rtol=1e-9, atol=1e-9 * want.max())

    def test_with_movavg(self, rng):
        cfg = PipelineConfig(width=96, height=8, numfftpoints=128,
                             numdisplaypoints=48, movavgn=3,
                             dtype="float64", compat=True)
        calib = Calibration.create(cfg)
        raw = rng.integers(0, 255, size=(8, 96)).astype(np.uint8)
        backg = np.full((8, 96), 50.0)
        piimg = np.zeros((8, 96))
        got = np.asarray(reconstruct(jnp.asarray(raw), jnp.asarray(backg),
                                     jnp.asarray(piimg), calib, cfg, "gather"))
        want = oracle.bscan_pipeline(raw, backg, piimg, cfg.lambdamin,
                                     cfg.lambdamax, 128, 48, movavgn=3)["mag"]
        assert np.allclose(got, want, rtol=1e-9, atol=1e-9 * max(want.max(), 1))

    def test_form_bscan_matches_oracle(self, sim_cfg, sim_frames):
        raw, backg, piimg = sim_frames
        calib = Calibration.create(sim_cfg)
        mags = reconstruct(jnp.asarray(raw), jnp.asarray(backg, jnp.float64),
                           jnp.asarray(piimg, jnp.float64), calib, sim_cfg,
                           method="gather")
        out = form_bscan(mags, sim_cfg, averages=1)
        want = oracle.bscan_pipeline(
            raw, backg, piimg, sim_cfg.lambdamin, sim_cfg.lambdamax,
            sim_cfg.numfftpoints, sim_cfg.numdisplaypoints)
        assert np.allclose(np.asarray(out.bscan), want["bscan"], rtol=1e-9)
        assert np.allclose(np.asarray(out.bscandb), want["bscandb"], rtol=1e-9)
        assert out.bscandisp.dtype == jnp.uint8

    def test_batched_averaging(self, sim_cfg, sim_frames):
        raw, backg, piimg = sim_frames
        calib = Calibration.create(sim_cfg)
        batch = jnp.stack([jnp.asarray(raw)] * 3)
        out = reconstruct_bscan(batch, jnp.asarray(backg, jnp.float64),
                                jnp.asarray(piimg, jnp.float64), calib, sim_cfg,
                                method="gather")
        single = reconstruct_bscan(jnp.asarray(raw), jnp.asarray(backg, jnp.float64),
                                   jnp.asarray(piimg, jnp.float64), calib, sim_cfg,
                                   method="gather")
        # averaging identical frames changes nothing
        assert np.allclose(np.asarray(out.bscan), np.asarray(single.bscan), rtol=1e-12)


class TestComplexAscans:
    def test_complex_magnitude_matches_mags(self, sim_cfg, sim_frames):
        from fdoct_tpu.pipeline import (
            apodize_ratio, ascan_complex, ascan_mags_fused, preprocess)
        import jax.numpy as jnp
        raw, backg, piimg = sim_frames
        calib = Calibration.create(sim_cfg)
        y = preprocess(jnp.asarray(raw), sim_cfg)
        yr = apodize_ratio(y, jnp.asarray(backg, jnp.float64),
                           jnp.asarray(piimg, jnp.float64), sim_cfg)
        z = ascan_complex(yr, calib)
        mags = ascan_mags_fused(yr, calib)
        assert np.allclose(np.abs(np.asarray(z)), np.asarray(mags), rtol=1e-12)

    def test_phase_shift_detectable(self, sim_cfg):
        """Sub-resolution displacement shows up as A-scan phase change at
        the peak (the phase-resolved OCT principle)."""
        from fdoct_tpu.pipeline import apodize_ratio, ascan_complex, preprocess
        import jax.numpy as jnp
        dz = 20e-9  # 20 nm — far below the depth resolution
        a = SyntheticSource(height=4, width=sim_cfg.width, depths_um=(40.0,))
        b = SyntheticSource(height=4, width=sim_cfg.width,
                            depths_um=(40.0 + dz * 1e6,))
        cfg = sim_cfg.replace(height=4)
        calib = Calibration.create(cfg)
        bgd = jnp.asarray(np.maximum(a.background(), 1).astype(np.float64))
        pid = jnp.zeros_like(bgd)
        za, zb = [
            np.asarray(ascan_complex(apodize_ratio(
                preprocess(jnp.asarray(next(iter(s.frames()))), cfg),
                bgd, pid, cfg), calib))
            for s in (a, b)
        ]
        peak = int(np.argmax(np.abs(za[0])[5:])) + 5
        dphi = np.angle(zb[0][peak] / za[0][peak])
        # expected Δφ = 2·k0·Δz (double-pass)
        expect = 2 * (2 * np.pi / cfg.lambda0) * dz
        assert abs(abs(dphi) - expect) < 0.5 * expect, (dphi, expect)


class TestPhysics:
    def _depth_bin(self, cfg, depth_m, calib):
        """Expected depth bin: fringe frequency over the k grid.

        A scatterer at optical depth z gives fringes exp(2i·z·k); over the
        uniform grid spanning Δk_total = klin[-1]-klin[0] the IFFT peak falls
        at bin round(z·Δk_total/π) — wait, bin = z·Δk_total/(π)·0.5... use
        cycles = 2·z·Δk_total/(2π) = z·Δk_total/π.
        """
        kl = np.asarray(calib.klinear)
        cycles = depth_m * (kl[-1] - kl[0]) / np.pi
        return cycles

    @pytest.mark.parametrize("method", ["gather", "fused"])
    def test_peak_at_known_depth(self, sim_cfg, method):
        depths = (40.0, 80.0)
        src = SyntheticSource(height=sim_cfg.height, width=sim_cfg.width,
                              depths_um=depths, reflectivities=(0.5, 0.25))
        raw = next(iter(src.frames()))
        calib = Calibration.create(sim_cfg)
        mags = np.asarray(reconstruct(
            jnp.asarray(raw), jnp.asarray(src.background(), jnp.float64),
            jnp.asarray(src.pi_frame(), jnp.float64), calib, sim_cfg, method))
        ascan = mags[0].copy()
        ascan[:5] = 0  # mask DC
        peak = int(np.argmax(ascan))
        expect = self._depth_bin(sim_cfg, depths[0] * 1e-6, calib)
        assert abs(peak - expect) <= 2, (peak, expect)

    def test_pi_subtraction_removes_dc(self, sim_cfg):
        # with the π frame subtracted, the DC term cancels (differential
        # reconstruction, wangOCT.m subplot 4): DC bins should be far below
        # the scatterer peak
        src = SyntheticSource(height=4, width=sim_cfg.width, depths_um=(60.0,),
                              reflectivities=(0.4,))
        cfg = sim_cfg.replace(height=4)
        calib = Calibration.create(cfg)
        raw = next(iter(src.frames()))
        mags = np.asarray(reconstruct(
            jnp.asarray(raw), jnp.asarray(src.background(), jnp.float64),
            jnp.asarray(src.pi_frame(), jnp.float64), calib, cfg, "gather"))
        ascan = mags[0]
        peak = ascan[5:].max()
        assert ascan[0] < peak  # DC below signal peak after π subtraction


class TestHilbertMethod:
    def test_hilbert_finds_same_peak(self, sim_cfg, sim_frames):
        """The analytic-signal estimator (wangOCTrec4 role) must locate the
        scatterer at the same depth bin as the direct IFFT path."""
        raw, backg, piimg = sim_frames
        calib = Calibration.create(sim_cfg)
        direct = np.asarray(reconstruct(
            jnp.asarray(raw), jnp.asarray(backg, jnp.float64),
            jnp.asarray(piimg, jnp.float64), calib, sim_cfg, "gather"))
        hil = np.asarray(reconstruct(
            jnp.asarray(raw), jnp.asarray(backg, jnp.float64),
            jnp.asarray(piimg, jnp.float64), calib, sim_cfg, "hilbert"))
        assert hil.shape == direct.shape
        a, b = direct[0].copy(), hil[0].copy()
        a[:5] = b[:5] = 0
        assert abs(int(np.argmax(a)) - int(np.argmax(b))) <= 1
