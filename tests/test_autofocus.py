"""Dispersion autofocus tests: the sweep must recover a known chirp."""

import numpy as np
import jax.numpy as jnp
import pytest

from fdoct_tpu.autofocus import autofocused_calibration, sweep_volume
from fdoct_tpu.calibration import Calibration
from fdoct_tpu.config import PipelineConfig
from fdoct_tpu.pipeline import ascan_mags_fused, reconstruct
from fdoct_tpu.sources.synthetic import SyntheticSource, wang_lambda_grid


@pytest.fixture(scope="module")
def cfg():
    return PipelineConfig(width=256, height=16, averages=1,
                          numfftpoints=512, numdisplaypoints=160,
                          lambdamin=816e-9, lambdamax=884e-9,
                          dtype="float64", compat=True)


def chirped_frames(cfg, a2_true):
    """Synthesize interferograms whose fringes carry a known quadratic
    phase (an unbalanced-dispersion sample)."""
    calib = Calibration.create(cfg)
    kl = np.asarray(calib.klinear)
    kc = (kl[0] + kl[-1]) / 2
    half = (kl[-1] - kl[0]) / 2
    lambdas = wang_lambda_grid(cfg.width)
    k = 2 * np.pi / lambdas
    x = (k - kc) / half
    z = 60e-6
    S = np.exp(-0.5 * ((lambdas - 850e-9) / 17e-9) ** 2)
    fringe = S * (1.25 + np.cos(2 * k * z + a2_true * x**2))
    img = np.tile(fringe / fringe.max(), (cfg.height, 1))
    bg = np.tile(S / S.max(), (cfg.height, 1))
    frame = np.round(img * 255).astype(np.uint8)
    return frame, np.maximum(bg * 255, 1.0)


def peak_sharpness(mags):
    a = mags[0][5:]
    return a.max() / a.mean()


class TestSweep:
    def test_recovers_chirp_and_sharpens(self, cfg):
        a2_true = 5.0
        frame, bg = chirped_frames(cfg, a2_true)
        calib = Calibration.create(cfg)
        pi = jnp.zeros_like(jnp.asarray(bg))
        grid = jnp.linspace(-8.0, 8.0, 33)
        scores, best = sweep_volume(jnp.asarray(frame)[None], jnp.asarray(bg),
                                    pi, calib, cfg, grid)
        # the displayed positive-depth peak is the conjugate fringe branch
        # under the ifft convention, so the winning compensation is +a2
        assert best == pytest.approx(a2_true, abs=0.75)

        # the autofocused operator must sharpen the A-scan peak
        blurred = np.asarray(reconstruct(jnp.asarray(frame), jnp.asarray(bg),
                                         pi, calib, cfg, "fused"))
        calib2 = autofocused_calibration(cfg, best)
        focused = np.asarray(reconstruct(jnp.asarray(frame), jnp.asarray(bg),
                                         pi, calib2, cfg, "fused"))
        assert peak_sharpness(focused) > 1.5 * peak_sharpness(blurred)

    def test_zero_dispersion_prefers_zero(self, cfg):
        frame, bg = chirped_frames(cfg, 0.0)
        calib = Calibration.create(cfg)
        pi = jnp.zeros_like(jnp.asarray(bg))
        grid = jnp.linspace(-6.0, 6.0, 25)
        _, best = sweep_volume(jnp.asarray(frame)[None], jnp.asarray(bg),
                               pi, calib, cfg, grid)
        assert abs(best) <= 0.5


class TestSweep2D:
    def test_joint_recovery(self, cfg):
        from fdoct_tpu.autofocus import sweep_volume_2d
        a2_true = 4.0
        frame, bg = chirped_frames(cfg, a2_true)
        calib = Calibration.create(cfg)
        pi = jnp.zeros_like(jnp.asarray(bg))
        scores, a2, a3 = sweep_volume_2d(
            jnp.asarray(frame)[None], jnp.asarray(bg), pi, calib, cfg,
            jnp.linspace(-6.0, 6.0, 13), jnp.linspace(-2.0, 2.0, 5))
        assert scores.shape == (13, 5)
        assert a2 == pytest.approx(a2_true, abs=1.0)
        assert abs(a3) <= 1.0  # no third-order chirp present


class TestSegmentedDispersion:
    def test_two_depths_two_coefficients(self, cfg):
        """Two scatterers whose chirps differ with depth: segmented
        compensation must sharpen both; the per-segment sweep must find a
        different coefficient for each."""
        import jax
        from fdoct_tpu.autofocus import (
            segmented_dispersion_mags, sweep_per_segment)
        from fdoct_tpu.pipeline import apodize_ratio, preprocess
        from fdoct_tpu.sources.synthetic import wang_lambda_grid

        calib = Calibration.create(cfg)
        kl = np.asarray(calib.klinear)
        kc = (kl[0] + kl[-1]) / 2
        half = (kl[-1] - kl[0]) / 2
        lambdas = wang_lambda_grid(cfg.width)
        k = 2 * np.pi / lambdas
        x = (k - kc) / half
        S = np.exp(-0.5 * ((lambdas - 850e-9) / 17e-9) ** 2)
        # shallow scatterer: no chirp; deep scatterer: strong chirp.
        # segment boundary is display bin 80 = z·Δk/π → ~424 µm, so put
        # the scatterers on opposite sides of it
        z1, z2 = 100e-6, 450e-6
        fringe = S * (2.5 + np.cos(2 * k * z1) + np.cos(2 * k * z2 + 6.0 * x**2))
        frame = np.round(np.tile(fringe / fringe.max(), (cfg.height, 1))
                         * 255).astype(np.uint8)
        bg = np.maximum(np.tile(S / S.max(), (cfg.height, 1)) * 255, 1.0)

        import jax.numpy as jnp
        yr = apodize_ratio(preprocess(jnp.asarray(frame), cfg),
                           jnp.asarray(bg), jnp.zeros_like(jnp.asarray(bg)),
                           cfg)
        grid = jnp.linspace(-8.0, 8.0, 17)
        best = np.asarray(sweep_per_segment(yr, calib, grid, n_segments=2))
        # shallow segment wants ~0, deep segment wants ~+6
        assert abs(best[0]) <= 2.0, best
        assert best[1] == pytest.approx(6.0, abs=1.5), best

        mags = np.asarray(segmented_dispersion_mags(
            yr, calib, jnp.asarray(best)))
        assert mags.shape == (cfg.height, cfg.numdisplaypoints)
        # both peaks sharp: each segment's max well above its local mean
        seg_len = cfg.numdisplaypoints // 2
        for s in range(2):
            seg = mags[0, s * seg_len:(s + 1) * seg_len]
            assert seg.max() > 8 * seg.mean(), s
