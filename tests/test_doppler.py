"""Doppler phase-resolved imaging tests: a scatterer moving a known
sub-resolution step per frame must produce the predicted velocity."""

import numpy as np
import jax.numpy as jnp
import pytest

from fdoct_tpu.calibration import Calibration
from fdoct_tpu.config import PipelineConfig
from fdoct_tpu.doppler import (
    displacement_m, doppler_bscan, phase_difference)
from fdoct_tpu.sources.synthetic import SyntheticSource


@pytest.fixture(scope="module")
def cfg():
    return PipelineConfig(width=256, height=8, averages=1,
                          numfftpoints=512, numdisplaypoints=160,
                          lambdamin=816e-9, lambdamax=884e-9,
                          dtype="float64", compat=True)


def moving_frames(cfg, step_nm, n_frames):
    frames, bg = [], None
    for t in range(n_frames):
        src = SyntheticSource(height=cfg.height, width=cfg.width,
                              depths_um=(50.0 + t * step_nm * 1e-3,),
                              reflectivities=(0.5,))
        frames.append(next(iter(src.frames())))
        bg = np.maximum(src.background(), 1).astype(np.float64)
    return np.stack(frames), bg


class TestPhaseDifference:
    def test_wrapped_range(self):
        z1 = jnp.asarray([1.0 + 0j])
        z2 = jnp.asarray([np.exp(1j * 2.5)])
        assert float(phase_difference(z1, z2)[0]) == pytest.approx(2.5, abs=1e-6)

    def test_displacement_formula(self, cfg):
        dphi = jnp.asarray(np.pi / 2)
        dz = float(displacement_m(dphi, cfg.lambda0))
        assert dz == pytest.approx(cfg.lambda0 / 8, rel=1e-6)


class TestDopplerBscan:
    def test_recovers_known_velocity(self, cfg):
        step_nm = 30.0   # per frame — far below depth resolution
        frames, bg = moving_frames(cfg, step_nm, 6)
        calib = Calibration.create(cfg)
        mag, vel = doppler_bscan(jnp.asarray(frames), jnp.asarray(bg),
                                 jnp.zeros_like(jnp.asarray(bg)), calib, cfg)
        mag, vel = np.asarray(mag), np.asarray(vel)
        assert mag.shape == vel.shape == (160, 8)
        # at the scatterer peak, displacement/frame ≈ step (optical path
        # is single-sided z here; doppler formula assumes double-pass, and
        # the synthetic phase is 4π·z/λ, i.e. double-pass — consistent)
        peak = np.unravel_index(np.argmax(mag[5:]), mag[5:].shape)
        v = vel[5:][peak] * 1e9
        assert v == pytest.approx(step_nm, rel=0.2), v

    def test_static_scene_zero_velocity(self, cfg):
        frames, bg = moving_frames(cfg, 0.0, 4)
        calib = Calibration.create(cfg)
        _, vel = doppler_bscan(jnp.asarray(frames), jnp.asarray(bg),
                               jnp.zeros_like(jnp.asarray(bg)), calib, cfg)
        assert np.abs(np.asarray(vel)).max() < 1e-12

    def test_noise_floor_masked(self, cfg):
        frames, bg = moving_frames(cfg, 20.0, 4)
        calib = Calibration.create(cfg)
        mag, vel = doppler_bscan(jnp.asarray(frames), jnp.asarray(bg),
                                 jnp.zeros_like(jnp.asarray(bg)), calib, cfg)
        mag, vel = np.asarray(mag), np.asarray(vel)
        weak = mag <= 0.1 * mag.max()
        assert np.all(vel[weak] == 0.0)


class TestOcta:
    def test_decorrelating_voxels_light_up(self, cfg):
        """Frames with a jittering scatterer (random depth each frame) give
        high speckle variance; a static scatterer gives near zero."""
        from fdoct_tpu.doppler import octa_bscan
        calib = Calibration.create(cfg)
        rng = np.random.default_rng(11)
        frames = []
        for _ in range(8):
            src = SyntheticSource(
                height=cfg.height, width=cfg.width,
                depths_um=(50.0 + rng.uniform(-2, 2), 90.0),  # 0: flow, 1: static
                reflectivities=(0.5, 0.5))
            frames.append(next(iter(src.frames())))
        bg = np.maximum(src.background(), 1).astype(np.float64)
        mag, sv = octa_bscan(jnp.asarray(np.stack(frames)), jnp.asarray(bg),
                             jnp.zeros_like(jnp.asarray(bg)), calib, cfg)
        mag, sv = np.asarray(mag), np.asarray(sv)
        kl = np.asarray(calib.klinear)
        bin50 = int(round(50e-6 * (kl[-1] - kl[0]) / np.pi))
        bin90 = int(round(90e-6 * (kl[-1] - kl[0]) / np.pi))
        flow = sv[bin50 - 1: bin50 + 2].max()
        static = sv[bin90 - 1: bin90 + 2].max()
        assert flow > 10 * static, (flow, static)
