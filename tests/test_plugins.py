"""Plugin tests: vibrometry physics, ROI analytics, J-mask."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import j0

from fdoct_tpu.config import PipelineConfig
from fdoct_tpu.plugins import (
    JMaskPlugin, ROIPlugin, VibrometryPlugin, bessel_db_inverse, errnull)
from fdoct_tpu.plugins.roi import ascan_min_max, roi_mean_db
from fdoct_tpu.plugins.vibrometry import displacement_nm, render_vib_profile
from fdoct_tpu.session import Session
from fdoct_tpu.sources.synthetic import SyntheticSource


class TestBesselInverse:
    def test_roundtrip(self):
        for x in (0.3, 0.8, 1.5, 2.0, 2.3):
            y = abs(20 * np.log10(abs(j0(x))))
            assert bessel_db_inverse(y) == pytest.approx(x, abs=1e-3)

    def test_saturation(self):
        assert bessel_db_inverse(45.0) == pytest.approx(2.38, abs=1e-6)
        assert bessel_db_inverse(0.0) == 0.0

    def test_agrees_with_reference_lut_quantization(self):
        # reference LUT steps x by ~0.05; the computed inverse must agree
        # within that quantization at the LUT's threshold points
        for x_ref in (2.38, 1.57, 0.97, 0.42):
            y = abs(20 * np.log10(abs(j0(x_ref + 0.024))))
            assert bessel_db_inverse(y) == pytest.approx(x_ref, abs=0.05)

    def test_errnull(self):
        # y → 2.405 - x; at the LUT top (30 dB) err ≈ 0.025
        assert errnull(45.0) == pytest.approx(2.405 - 2.38, abs=1e-6)
        assert errnull(0.0) == pytest.approx(2.405)

    def test_displacement_formula(self):
        lam = 850e-9
        y = abs(20 * np.log10(abs(j0(1.0))))
        # A = x λ /(4π)
        assert displacement_nm(y, lam) == pytest.approx(
            1.0 * lam * 1e9 / (4 * np.pi), rel=1e-3)


class TestVibrometryEndToEnd:
    def test_recovers_vibration_amplitude(self):
        """Full-physics check: vibrating source → peak-hold holds →
        displacement within the LUT-grade tolerance."""
        cfg = PipelineConfig(width=256, height=8, averages=1,
                             numfftpoints=512, numdisplaypoints=160,
                             dtype="float64", compat=True,
                             peakholdnumframes=40)
        amp_nm = 60.0
        lam0 = cfg.lambda0
        still = SyntheticSource(height=8, width=256, depths_um=(40.0,),
                                reflectivities=(0.5,), seed=3)
        vibr = SyntheticSource(height=8, width=256, depths_um=(40.0,),
                               reflectivities=(0.5,), seed=4,
                               vibration_amp_nm=amp_nm)
        s = Session(cfg)
        plug = VibrometryPlugin(lam0, cfg.peakholdnumframes)
        s.plugins.append(plug)
        s.data_yb = jnp.asarray(np.maximum(still.background().astype(np.float64), 1.0))
        s.ascanat = 4
        plug.set_roi(x=2, y=10, w=4, h=140)

        def run_hold(key, source, n):
            s.key(key)
            it = iter(source.frames())
            count = 0
            while plug.active_hold is not None and count < n * 3:
                s.process(next(it))
                count += 1

        run_hold("1", still, cfg.peakholdnumframes)
        run_hold("2", still, cfg.peakholdnumframes)
        run_hold("3", vibr, cfg.peakholdnumframes)
        assert plug.dispnm is not None
        # J0 inversion from a 40-frame random-phase hold: expect the right
        # amplitude within ~20%
        assert plug.dispnm == pytest.approx(amp_nm, rel=0.25)
        assert plug.profile is not None and plug.profile.shape == (4,)

    def test_roi_required_before_hold(self):
        cfg = PipelineConfig(width=64, height=4, numfftpoints=128,
                             numdisplaypoints=40, dtype="float64")
        s = Session(cfg)
        plug = VibrometryPlugin(cfg.lambda0, 5)
        s.plugins.append(plug)
        s.key("1")
        assert plug.active_hold is None  # refused: no ROI selected

    def test_roi_keys(self):
        cfg = PipelineConfig(width=64, height=4, numfftpoints=128,
                             numdisplaypoints=40, dtype="float64")
        s = Session(cfg)
        plug = VibrometryPlugin(cfg.lambda0, 5)
        s.plugins.append(plug)
        s.key(">"); s.key(">"); s.key("<")
        assert plug.roi["x"] == 1
        s.key(","); s.key(".")
        assert plug.roi["y"] == 0
        s.key("M"); s.key("?")
        assert plug.roi["w"] == 11 and plug.roi["h"] == 11

    def test_render_profile(self):
        img = render_vib_profile(np.array([0.0, 100.0, -100.0]))
        assert img.shape == (640, 3)
        assert img.max() == 255


class TestROI:
    def test_ascan_min_max_masks_dc(self):
        b = np.zeros((20, 8))
        b[0, 3] = 99.0   # DC row value must be masked by row 4
        b[10, 3] = 7.0
        lo, hi = ascan_min_max(b, 3, 20)
        assert hi == 7.0

    def test_roi_mean(self):
        b = np.ones((20, 30)) * 5.0
        assert roi_mean_db(b, 4, 10, 10) == pytest.approx(5.0)
        assert roi_mean_db(b, 25, 10, 10) is None  # off the edge

    def test_strip_chart_advances(self):
        cfg = PipelineConfig(width=64, height=8, numfftpoints=128,
                             numdisplaypoints=40, averages=1, dtype="float64")
        src = SyntheticSource(height=8, width=64, depths_um=(20.0,))
        s = Session(cfg)
        plug = ROIPlugin()
        s.plugins.append(plug)
        s.ROIreport = True
        s.ascanat = 2
        s.widthROI = 3  # ROI must fit inside oph=8 lateral positions
        it = iter(src.frames())
        for _ in range(3):
            s.process(next(it))
        assert plug.col == 3
        assert plug.last_minmax is not None


class TestJMask:
    def test_mask_passes_brightened_pixels(self):
        cfg = PipelineConfig(width=64, height=8, numfftpoints=128,
                             numdisplaypoints=40, averages=1, dtype="float64")
        s = Session(cfg, variant="sim")
        plug = JMaskPlugin()
        s.plugins.append(plug)
        src = SyntheticSource(height=8, width=64, depths_um=(20.0,))
        it = iter(src.frames())
        s.key("j")
        s.process(next(it))   # captures jscansave from this display
        r = s.process(next(it))
        assert r.sub_disp is not None
        # identical frames → nothing brightened → fully masked
        assert r.sub_disp.max() == 0
