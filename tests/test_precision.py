"""Precision-policy tests: the float32 production path must be
display-equivalent to the float64 compat path."""

import numpy as np
import jax.numpy as jnp
import pytest

from fdoct_tpu.calibration import Calibration
from fdoct_tpu.config import PipelineConfig
from fdoct_tpu.pipeline import form_bscan, reconstruct
from fdoct_tpu.sources.synthetic import SyntheticSource


@pytest.fixture(scope="module")
def data():
    cfg64 = PipelineConfig(width=256, height=32, averages=4,
                           numfftpoints=512, numdisplaypoints=160,
                           lambdamin=816e-9, lambdamax=884e-9,
                           dtype="float64", compat=True)
    src = SyntheticSource(height=32, width=256, depths_um=(40.0, 80.0),
                          reflectivities=(0.5, 0.3), noise=0.01, seed=9)
    it = iter(src.frames())
    frames = np.stack([next(it) for _ in range(4)])
    bg = np.maximum(src.background().astype(np.float64), 1.0)
    return cfg64, frames, bg


def _display(cfg, frames, bg, dtype, method):
    cfgd = cfg.replace(dtype=dtype)
    calib = Calibration.create(cfgd, dtype=dtype)
    mags = reconstruct(jnp.asarray(frames), jnp.asarray(bg, dtype),
                       jnp.asarray(np.zeros_like(bg), dtype), calib, cfgd,
                       method=method)
    return np.asarray(form_bscan(mags.sum(0), cfgd, 4).bscandisp).astype(int)


class TestDisplayEquivalence:
    def test_f32_fused_vs_f64_gather(self, data):
        cfg, frames, bg = data
        ref = _display(cfg, frames, bg, "float64", "gather")
        fast = _display(cfg, frames, bg, "float32", "fused")
        diff = np.abs(ref - fast)
        # display-equivalent: at most 2 gray levels on at least 99% pixels
        assert np.mean(diff <= 2) > 0.99, float(np.mean(diff <= 2))
        assert diff.max() <= 8

    def test_f32_gather_vs_f64_gather(self, data):
        cfg, frames, bg = data
        ref = _display(cfg, frames, bg, "float64", "gather")
        fast = _display(cfg, frames, bg, "float32", "gather")
        diff = np.abs(ref - fast)
        assert np.mean(diff <= 2) > 0.99


class TestMatmulPrecisionKnob:
    def test_fused_exact_method(self, data):
        """method='fused_exact' / matmul_precision='highest' forces exact
        f32 matmuls (identical to default on CPU; tighter on TPU)."""
        cfg, frames, bg = data
        a = _display(cfg, frames, bg, "float32", "fused")
        b = _display(cfg, frames, bg, "float32", "fused_exact")
        assert np.abs(a - b).max() <= 1
