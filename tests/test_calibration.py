"""Calibration precompute and resampling parity tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from fdoct_tpu.calibration import Calibration, reference_grids
from fdoct_tpu.config import PipelineConfig
from fdoct_tpu.ops.resample import resample_klinear, resample_matrix, row_slopes
import oracle


@pytest.fixture(scope="module")
def cfg():
    return PipelineConfig(width=128, height=16, binvalue=1,
                          numfftpoints=256, numdisplaypoints=96,
                          lambdamin=816e-9, lambdamax=884e-9,
                          increasefftpointsmultiplier=2,
                          dtype="float64", compat=True)


class TestGrids:
    def test_grids_match_oracle(self, cfg):
        g = reference_grids(cfg)
        o = oracle.grids(cfg.lambdamin, cfg.lambdamax, cfg.opw,
                         cfg.numfftpoints, cfg.increasefftpointsmultiplier)
        assert np.allclose(g["lambdas"], o["lambdas"], rtol=0, atol=0)
        assert np.allclose(g["k"], o["k"], rtol=1e-15)
        assert np.allclose(g["klinear"], o["klinear"], rtol=1e-15)
        assert np.array_equal(g["nearest_idx"], o["nearest"])
        assert np.allclose(g["frac"], o["frac"], rtol=1e-12)

    def test_grids_no_mult(self):
        cfg = PipelineConfig(width=64, height=8, numfftpoints=128,
                             increasefftpointsmultiplier=1, dtype="float64")
        g = reference_grids(cfg)
        o = oracle.grids(cfg.lambdamin, cfg.lambdamax, 64, 128, 1)
        assert np.array_equal(g["nearest_idx"], o["nearest"])
        assert np.allclose(g["frac"], o["frac"], rtol=1e-12)

    def test_k_decreasing_klinear_increasing(self, cfg):
        g = reference_grids(cfg)
        assert np.all(np.diff(g["k"]) < 0)
        assert np.all(np.diff(g["klinear"]) > 0)


class TestResample:
    def test_gather_matches_oracle(self, cfg, rng):
        g = reference_grids(cfg)
        n_in = cfg.opw * cfg.increasefftpointsmultiplier
        y = rng.normal(size=(5, n_in))
        got = np.asarray(resample_klinear(
            jnp.asarray(y), jnp.asarray(g["nearest_idx"]), jnp.asarray(g["frac"]),
            compat=True))
        want = oracle.klinear_interp(y, g["nearest_idx"], g["frac"], cfg.numfftpoints)
        assert np.allclose(got, want, atol=1e-12)

    def test_matrix_matches_gather(self, cfg, rng):
        g = reference_grids(cfg)
        n_in = cfg.opw * cfg.increasefftpointsmultiplier
        y = rng.normal(size=(4, n_in))
        gather = np.asarray(resample_klinear(
            jnp.asarray(y), jnp.asarray(g["nearest_idx"]), jnp.asarray(g["frac"]),
            compat=True))
        R = resample_matrix(g["nearest_idx"], g["frac"], n_in, compat=True)
        assert np.allclose(y @ R, gather, atol=1e-12)

    def test_clean_mode_interpolates_exactly(self, cfg):
        # clean mode on a linear-in-k signal must reproduce it exactly
        g = reference_grids(cfg)
        n_in = cfg.opw * cfg.increasefftpointsmultiplier
        y = (3.0 * g["k"] + 1.0)[None]  # linear in k
        frac_clean = g["frac"]          # same table; clean path indexes by q
        got = np.asarray(resample_klinear(
            jnp.asarray(y), jnp.asarray(g["nearest_idx"]), jnp.asarray(frac_clean),
            compat=False))[0]
        want = 3.0 * g["klinear"] + 1.0
        interior = slice(1, -1)
        assert np.allclose(got[interior], want[interior], rtol=1e-9)

    def test_clean_matrix_matches_clean_gather(self, cfg, rng):
        g = reference_grids(cfg)
        n_in = cfg.opw * cfg.increasefftpointsmultiplier
        y = rng.normal(size=(3, n_in))
        gather = np.asarray(resample_klinear(
            jnp.asarray(y), jnp.asarray(g["nearest_idx"]), jnp.asarray(g["frac"]),
            compat=False))
        R = resample_matrix(g["nearest_idx"], g["frac"], n_in, compat=False)
        assert np.allclose(y @ R, gather, atol=1e-12)

    def test_clamp_regime_when_n_in_exceeds_nfft(self, rng):
        """When opw·mult > nfft the reference reads fractionalk out of
        bounds (PARITY.md D1); our compat clamp must keep gather, matrix
        and oracle consistent."""
        cfg = PipelineConfig(width=256, height=4, numfftpoints=192,
                             numdisplaypoints=64,
                             increasefftpointsmultiplier=2,
                             dtype="float64", compat=True)
        g = reference_grids(cfg)
        n_in = cfg.opw * 2
        assert n_in > cfg.numfftpoints
        assert g["nearest_idx"].max() >= cfg.numfftpoints  # clamp engaged
        y = rng.normal(size=(3, n_in))
        gather = np.asarray(resample_klinear(
            jnp.asarray(y), jnp.asarray(g["nearest_idx"]),
            jnp.asarray(g["frac"]), compat=True))
        R = resample_matrix(g["nearest_idx"], g["frac"], n_in, compat=True)
        want = oracle.klinear_interp(y, g["nearest_idx"], g["frac"],
                                     cfg.numfftpoints)
        assert np.allclose(gather, want, atol=1e-12)
        assert np.allclose(y @ R, gather, atol=1e-12)

    def test_row_slopes(self, rng):
        y = rng.normal(size=(2, 10))
        s = np.asarray(row_slopes(jnp.asarray(y)))
        assert np.allclose(s[:, 1:], np.diff(y, axis=1))
        assert np.allclose(s[:, 0], s[:, 1])


class TestFusedOperator:
    def test_fused_matches_gather_path(self, cfg, rng):
        from fdoct_tpu.pipeline import ascan_mags_fused, ascan_mags_gather
        calib = Calibration.create(cfg)
        yr = jnp.asarray(rng.normal(size=(8, cfg.opw)))
        fused = np.asarray(ascan_mags_fused(yr, calib))
        gather = np.asarray(ascan_mags_gather(yr, calib))
        assert fused.shape == gather.shape == (8, cfg.numdisplaypoints)
        assert np.allclose(fused, gather, rtol=1e-8, atol=1e-8)

    def test_fused_with_dispersion(self, cfg, rng):
        from fdoct_tpu.pipeline import ascan_mags_fused, ascan_mags_gather
        dcfg = cfg.replace(dispersion_a2=2.5, dispersion_a3=-0.7)
        calib = Calibration.create(dcfg)
        assert calib.has_phase
        yr = jnp.asarray(rng.normal(size=(4, cfg.opw)))
        fused = np.asarray(ascan_mags_fused(yr, calib))
        gather = np.asarray(ascan_mags_gather(yr, calib))
        assert np.allclose(fused, gather, rtol=1e-8, atol=1e-8)

    def test_calibration_is_pytree(self, cfg):
        import jax
        calib = Calibration.create(cfg)
        leaves = jax.tree_util.tree_leaves(calib)
        # 9 array fields; the int8 operator tables are None unless
        # cfg.matmul_precision == "int8" (they cost replicated device bytes)
        assert len(leaves) == 9
        calib8 = Calibration.create(cfg.replace(matmul_precision="int8"))
        assert len(jax.tree_util.tree_leaves(calib8)) == 13
        # static fields must be hashable trace-time constants
        jax.jit(lambda c: c.window * 2)(calib)
