"""Pipeline invariants: structural properties that must hold for any input
(cheap randomized checks complementing the oracle parity tests)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fdoct_tpu.calibration import Calibration, reference_grids
from fdoct_tpu.config import PipelineConfig
from fdoct_tpu.pipeline import ascan_mags_fused, ascan_mags_gather, reconstruct


@pytest.fixture(scope="module")
def cfg():
    return PipelineConfig(width=128, height=8, numfftpoints=256,
                          numdisplaypoints=96, dtype="float64", compat=True)


@pytest.fixture(scope="module")
def calib(cfg):
    return Calibration.create(cfg)


class TestLinearity:
    def test_magnitudes_scale_linearly(self, cfg, calib, rng):
        """|(αy) @ M| = α·|y @ M| — the reconstruction is homogeneous, so
        camera gain only scales the B-scan (before the log)."""
        yr = jnp.asarray(rng.normal(size=(4, cfg.opw)))
        a = np.asarray(ascan_mags_fused(yr, calib))
        b = np.asarray(ascan_mags_fused(3.5 * yr, calib))
        assert np.allclose(b, 3.5 * a, rtol=1e-12)

    def test_superposition_of_scatterers(self, cfg, calib, rng):
        """Adding interferograms adds their complex spectra: |A+B| ≤ |A|+|B|
        and the combined reconstruction shows both peaks."""
        from fdoct_tpu.pipeline import ascan_complex
        y1 = jnp.asarray(rng.normal(size=(1, cfg.opw)))
        y2 = jnp.asarray(rng.normal(size=(1, cfg.opw)))
        z1 = np.asarray(ascan_complex(y1, calib))
        z2 = np.asarray(ascan_complex(y2, calib))
        z12 = np.asarray(ascan_complex(y1 + y2, calib))
        assert np.allclose(z12, z1 + z2, atol=1e-10)

    def test_dc_invariance(self, cfg, calib, rng):
        """Adding a constant per row changes nothing (DC removal is inside
        the operator)."""
        yr = jnp.asarray(rng.normal(size=(3, cfg.opw)))
        shifted = yr + jnp.asarray(rng.normal(size=(3, 1)))
        a = np.asarray(ascan_mags_fused(yr, calib))
        b = np.asarray(ascan_mags_fused(shifted, calib))
        assert np.allclose(a, b, atol=1e-9)


class TestCalibrationStructure:
    @pytest.mark.parametrize("opw,nfft,mult", [(64, 128, 1), (96, 200, 2),
                                               (128, 96, 3)])
    def test_nearest_monotone_nonincreasing(self, opw, nfft, mult):
        """k decreasing + klinear increasing ⇒ nearest indices non-increasing
        in q (except unfound → 0)."""
        cfg = PipelineConfig(width=opw, height=4, numfftpoints=nfft,
                             numdisplaypoints=min(nfft // 2, 48),
                             increasefftpointsmultiplier=mult,
                             dtype="float64")
        g = reference_grids(cfg)
        idx = g["nearest_idx"].astype(int)
        nz = idx[idx > 0]
        assert np.all(np.diff(nz) <= 0)

    def test_frac_mostly_unit_interval(self):
        cfg = PipelineConfig(width=128, height=4, numfftpoints=256,
                             numdisplaypoints=64, dtype="float64")
        g = reference_grids(cfg)
        inbounds = (g["frac"] >= -1e-9) & (g["frac"] <= 1 + 1e-9)
        assert inbounds.mean() > 0.95  # edges may extrapolate slightly

    def test_operator_kills_dc_column(self, cfg, calib):
        """A constant spectrum must map to (numerically) zero A-scan."""
        ones = jnp.ones((1, cfg.opw))
        mags = np.asarray(ascan_mags_fused(ones, calib))
        assert mags.max() < 1e-8 * cfg.numfftpoints


class TestRandomizedParity:
    @pytest.mark.parametrize("seed", range(5))
    def test_fused_equals_gather_random(self, cfg, calib, seed):
        rng = np.random.default_rng(seed)
        yr = jnp.asarray(rng.normal(size=(2, cfg.opw))
                         * 10.0 ** rng.integers(-3, 3))
        a = np.asarray(ascan_mags_gather(yr, calib))
        b = np.asarray(ascan_mags_fused(yr, calib))
        assert np.allclose(a, b, rtol=1e-8, atol=1e-8 * max(a.max(), 1e-30))

    @pytest.mark.parametrize("seed", range(3))
    def test_random_config_roundtrip(self, seed, tmp_path):
        from fdoct_tpu.config import SCHEMAS, read_ini, write_ini
        rng = np.random.default_rng(seed)
        cfg = PipelineConfig(
            width=int(rng.integers(64, 2048)), height=int(rng.integers(8, 960)),
            averages=int(rng.integers(1, 100)),
            numfftpoints=int(rng.integers(128, 4096)),
            lambdamin=float(rng.uniform(700e-9, 850e-9)),
            lambdamax=float(rng.uniform(860e-9, 1000e-9)),
            gain=int(rng.integers(0, 99)),
            dirdescr=f"rand{seed}")
        p = tmp_path / "r.ini"
        write_ini(cfg, p, "base")
        back = read_ini(p, "base")
        for name, _ in SCHEMAS["base"]:
            assert getattr(back, name) == getattr(cfg, name), name
