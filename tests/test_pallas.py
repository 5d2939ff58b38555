"""Pallas fused-reconstruction kernel tests (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fdoct_tpu.ops.pallas_kernels import fused_recon_accumulate


@pytest.fixture(scope="module")
def problem(rng):
    B, rows, n_in, ndisp = 3, 16, 64, 32
    yr = rng.normal(size=(B, rows, n_in)).astype(np.float32)
    mr = rng.normal(size=(n_in, ndisp)).astype(np.float32)
    mi = rng.normal(size=(n_in, ndisp)).astype(np.float32)
    return yr, mr, mi


def reference_accum(yr, mr, mi):
    re = yr @ mr
    im = yr @ mi
    return np.sqrt(re * re + im * im).sum(axis=0)


def test_matches_reference(problem):
    yr, mr, mi = problem
    got = np.asarray(fused_recon_accumulate(
        jnp.asarray(yr), jnp.asarray(mr), jnp.asarray(mi),
        tile_rows=8, tile_depth=16, interpret=True))
    want = reference_accum(yr, mr, mi)
    assert got.shape == want.shape
    assert np.allclose(got, want, rtol=1e-5, atol=1e-5)


def test_single_frame(problem):
    yr, mr, mi = problem
    got = np.asarray(fused_recon_accumulate(
        jnp.asarray(yr[:1]), jnp.asarray(mr), jnp.asarray(mi),
        tile_rows=16, tile_depth=32, interpret=True))
    want = reference_accum(yr[:1], mr, mi)
    assert np.allclose(got, want, rtol=1e-5, atol=1e-5)


def test_group_pallas_matches_reconstruct(rng):
    import jax.numpy as jnp
    from fdoct_tpu.calibration import Calibration
    from fdoct_tpu.config import PipelineConfig
    from fdoct_tpu.pipeline import reconstruct, reconstruct_group_pallas

    cfg = PipelineConfig(width=64, height=16, averages=3, numfftpoints=128,
                         numdisplaypoints=32, dtype="float32", compat=True)
    calib = Calibration.create(cfg, dtype="float32")
    raw = rng.integers(0, 255, (3, 16, 64)).astype(np.uint8)
    bg = jnp.full((16, 64), 100.0, jnp.float32)
    pi = jnp.zeros((16, 64), jnp.float32)
    got = np.asarray(reconstruct_group_pallas(
        jnp.asarray(raw), bg, pi, calib, cfg, interpret=True))
    want = np.asarray(reconstruct(jnp.asarray(raw), bg, pi, calib, cfg,
                                  method="fused")).sum(axis=0)
    assert np.allclose(got, want, rtol=1e-5, atol=1e-5 * want.max())


def test_bf16_operands(problem):
    yr, mr, mi = problem
    got = np.asarray(fused_recon_accumulate(
        jnp.asarray(yr, jnp.bfloat16), jnp.asarray(mr, jnp.bfloat16),
        jnp.asarray(mi, jnp.bfloat16),
        tile_rows=8, tile_depth=16, interpret=True))
    want = reference_accum(yr, mr, mi)
    # bf16 products, f32 accumulation: ~1% tolerance
    assert np.allclose(got, want, rtol=0.05, atol=0.05 * np.abs(want).max())


def test_raw_kernel_matches_xla_path(rng):
    import jax.numpy as jnp
    from fdoct_tpu.ops.pallas_kernels import fused_recon_raw_accumulate
    B, rows, n_in, ndisp = 3, 16, 64, 32
    raw = rng.integers(0, 255, (B, rows, n_in)).astype(np.uint8)
    bg = rng.uniform(50, 200, (rows, n_in)).astype(np.float32)
    pi = rng.uniform(0, 50, (rows, n_in)).astype(np.float32)
    mr = rng.normal(size=(n_in, ndisp)).astype(np.float32)
    mi = rng.normal(size=(n_in, ndisp)).astype(np.float32)
    got = np.asarray(fused_recon_raw_accumulate(
        jnp.asarray(raw), jnp.asarray(pi), jnp.asarray(1.0 / bg),
        jnp.asarray(mr), jnp.asarray(mi),
        tile_rows=8, tile_depth=16, interpret=True))
    yr = (raw.astype(np.float32) - pi) / bg
    re = yr @ mr
    im = yr @ mi
    want = np.sqrt(re * re + im * im).sum(0)
    assert np.allclose(got, want, rtol=1e-4, atol=1e-4 * np.abs(want).max())


def test_resident_kernel_matches_reference(rng):
    import jax.numpy as jnp
    from fdoct_tpu.ops.pallas_kernels import fused_recon_resident
    B, rows, n_in, ndisp = 3, 16, 64, 32
    raw = rng.integers(0, 255, (B, rows, n_in)).astype(np.uint8)
    bg = rng.uniform(50, 200, (rows, n_in)).astype(np.float32)
    pi = rng.uniform(0, 50, (rows, n_in)).astype(np.float32)
    mr = rng.normal(size=(n_in, ndisp)).astype(np.float32)
    mi = rng.normal(size=(n_in, ndisp)).astype(np.float32)
    got = np.asarray(fused_recon_resident(
        jnp.asarray(raw), jnp.asarray(pi), jnp.asarray(1.0 / bg),
        jnp.asarray(mr), jnp.asarray(mi), tile_rows=8, interpret=True))
    yr = (raw.astype(np.float32) - pi) / bg
    want = np.sqrt((yr @ mr) ** 2 + (yr @ mi) ** 2).sum(0)
    # bf16 operator: percent-level tolerance
    assert np.allclose(got, want, rtol=0.02, atol=0.02 * np.abs(want).max())
