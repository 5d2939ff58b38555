"""Golden parity against the reference's own fixtures and configs.

These tests read DATA (PNG fixtures, ini files) from the read-only
reference mount and compare against this framework's regenerated physics
and reconstruction — the exact validation pattern the reference itself uses
(BscanFFTsim + wangOCTrec oracle, SURVEY.md §4).  Skipped when the mount is
absent.
"""

import os
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

REF = Path("/root/reference")
FIX = REF / "Matlab files"

pytestmark = pytest.mark.skipif(not FIX.exists(),
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref_fixtures():
    from fdoct_tpu.utils.imageio import read_png_gray
    return {name: read_png_gray(FIX / f"{name}.png")
            for name in ("imgi", "backg")}


class TestFixtureRegeneration:
    def test_wang_fixture_matches_reference_imgi(self, ref_fixtures):
        """Our physics generator must reproduce the checked-in 96×128
        16-bit imgi.png (wangOCTimg.m output) to within quantization."""
        from fdoct_tpu.sources.synthetic import wang_fixture
        ours = wang_fixture()
        ref = ref_fixtures["imgi"]
        assert ref.shape == ours["imgi"].shape == (96, 128)
        rel = (np.abs(ours["imgi"].astype(float) - ref.astype(float))
               / 65535.0)
        assert np.mean(rel <= 1e-3) > 0.99, float(rel.max())

    def test_backg_matches_reference(self, ref_fixtures):
        from fdoct_tpu.sources.synthetic import wang_fixture
        ours = wang_fixture()
        rel = (np.abs(ours["backg"].astype(float)
                      - ref_fixtures["backg"].astype(float)) / 65535.0)
        assert np.mean(rel <= 1e-3) > 0.99, float(rel.max())


class TestProductionConfigEndToEnd:
    def test_reference_qhy_config_reconstructs(self):
        """Full pipeline on the reference's shipped BscanFFT.ini values
        (320×240, bin 2, nfft 2560, ×4 zero-pad, 320 display points):
        gather and fused paths must agree and resolve a known scatterer."""
        from fdoct_tpu.calibration import Calibration
        from fdoct_tpu.config import read_ini
        from fdoct_tpu.pipeline import reconstruct
        from fdoct_tpu.sources.synthetic import SyntheticSource

        cfg = read_ini(REF / "build" / "BscanFFT.ini", "base").replace(
            dtype="float64", compat=True,
            # the shipped λ range (840.5-859.5 nm); keep as parsed
        )
        assert cfg.numfftpoints == 2560 and cfg.increasefftpointsmultiplier == 4
        calib = Calibration.create(cfg)
        assert calib.n_in == cfg.opw * 4

        src = SyntheticSource(height=cfg.height, width=cfg.width,
                              lambda0=cfg.lambda0,
                              dlambda=cfg.lambdabw * 2.3548 / 4,
                              depths_um=(60.0,), reflectivities=(0.5,))
        raw = next(iter(src.frames()))
        bg = np.maximum(src.background(), 1).astype(np.float64)
        # background captured post-binning in the live flow
        from fdoct_tpu.pipeline import preprocess
        bgb = np.asarray(preprocess(jnp.asarray(bg), cfg))
        pib = np.zeros_like(bgb)
        a = np.asarray(reconstruct(jnp.asarray(raw), jnp.asarray(bgb),
                                   jnp.asarray(pib), calib, cfg, "gather"))
        b = np.asarray(reconstruct(jnp.asarray(raw), jnp.asarray(bgb),
                                   jnp.asarray(pib), calib, cfg, "fused"))
        assert a.shape == (cfg.oph, cfg.numdisplaypoints)
        assert np.allclose(a, b, rtol=1e-7, atol=1e-7 * a.max())
        # scatterer resolved: one clear peak outside DC
        ascan = a[10].copy()
        ascan[:6] = 0
        peak_bin = int(np.argmax(ascan))
        expect = 60e-6 * (np.asarray(calib.klinear)[-1]
                          - np.asarray(calib.klinear)[0]) / np.pi
        assert abs(peak_bin - expect) <= 3, (peak_bin, float(expect))


class TestReferenceIniConfigs:
    @pytest.mark.parametrize("ini,variant", [
        ("BscanFFT.ini", "base"),
        ("BscanFFTspinjnt.ini", "spinjnt"),
    ])
    def test_reference_inis_parse(self, ini, variant):
        from fdoct_tpu.config import read_ini
        path = REF / "build" / ini
        if not path.exists():
            pytest.skip(f"{ini} not in reference")
        cfg = read_ini(path, variant)
        assert cfg.width > 0 and cfg.numfftpoints > 0


class TestReconstructionOfReferenceFixtures:
    CFG_KW = dict(width=128, height=96, binvalue=1, averages=1,
                  numfftpoints=256, numdisplaypoints=128,
                  lambdamin=816e-9, lambdamax=884e-9,
                  dtype="float64", compat=True)

    def test_bscan_staircase_from_reference_imgi(self, ref_fixtures):
        """Reconstruct the reference's own imgi.png; the B-scan must show
        the wangOCTimg staircase: scatterer depth increasing row by row
        (one scatterer pair per lateral row at ii / ii+50 µm)."""
        from fdoct_tpu.calibration import Calibration
        from fdoct_tpu.config import PipelineConfig
        from fdoct_tpu.pipeline import reconstruct

        cfg = PipelineConfig(**self.CFG_KW)
        calib = Calibration.create(cfg)
        raw = ref_fixtures["imgi"]
        bg = np.maximum(ref_fixtures["backg"].astype(np.float64), 1.0)
        pi = np.zeros_like(bg)
        mags = np.asarray(reconstruct(
            jnp.asarray(raw), jnp.asarray(bg), jnp.asarray(pi),
            calib, cfg, method="fused"))
        peaks = [int(np.argmax(mags[r][6:])) + 6 for r in range(20, 90, 10)]
        # depth must increase monotonically down the staircase
        assert all(b > a for a, b in zip(peaks, peaks[1:])), peaks

    def test_gather_and_fused_agree_on_reference_data(self, ref_fixtures):
        from fdoct_tpu.calibration import Calibration
        from fdoct_tpu.config import PipelineConfig
        from fdoct_tpu.pipeline import reconstruct

        cfg = PipelineConfig(**self.CFG_KW)
        calib = Calibration.create(cfg)
        raw = ref_fixtures["imgi"]
        bg = np.maximum(ref_fixtures["backg"].astype(np.float64), 1.0)
        pi = np.zeros_like(bg)
        a = np.asarray(reconstruct(jnp.asarray(raw), jnp.asarray(bg),
                                   jnp.asarray(pi), calib, cfg, "gather"))
        b = np.asarray(reconstruct(jnp.asarray(raw), jnp.asarray(bg),
                                   jnp.asarray(pi), calib, cfg, "fused"))
        assert np.allclose(a, b, rtol=1e-8, atol=1e-8 * a.max())

    def test_oracle_parity_on_reference_fixture(self, ref_fixtures):
        """Full pipeline on the reference's own data vs the NumPy oracle."""
        import oracle
        from fdoct_tpu.calibration import Calibration
        from fdoct_tpu.config import PipelineConfig
        from fdoct_tpu.pipeline import reconstruct

        cfg = PipelineConfig(**self.CFG_KW)
        calib = Calibration.create(cfg)
        raw = ref_fixtures["imgi"]
        bg = np.maximum(ref_fixtures["backg"].astype(np.float64), 1.0)
        pi = np.zeros_like(bg)
        got = np.asarray(reconstruct(jnp.asarray(raw), jnp.asarray(bg),
                                     jnp.asarray(pi), calib, cfg, "gather"))
        want = oracle.bscan_pipeline(
            raw, bg, pi, cfg.lambdamin, cfg.lambdamax,
            cfg.numfftpoints, cfg.numdisplaypoints)["mag"]
        assert np.allclose(got, want, rtol=1e-9, atol=1e-9 * want.max())
