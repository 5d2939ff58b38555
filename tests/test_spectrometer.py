"""Spectrometer ingestion and measured-λ calibration tests."""

import numpy as np
import pytest

from fdoct_tpu.sources.spectrometer import (
    calibration_from_lambdas, read_procspec, read_procspec_xml,
    reconstruct_spectrometer_ascans)


def make_procspec_xml(pixels, lambdas=None):
    lines = ["<?xml version=\"1.0\"?>", "<sourceSpectra>", "<pixelValues>"]
    lines += [f"  <double>{v}</double>" for v in pixels]
    lines += ["</pixelValues>"]
    if lambdas is not None:
        lines += ["<wavelengths>"]
        lines += [f"  <double>{v}</double>" for v in lambdas]
        lines += ["</wavelengths>"]
    lines += ["</sourceSpectra>"]
    return "\n".join(lines)


class TestProcSpec:
    def test_parse_blocks(self, rng):
        px = rng.normal(size=100)
        lam = np.linspace(700, 900, 100)
        blocks = read_procspec_xml(make_procspec_xml(px, lam))
        assert len(blocks) == 2
        assert np.allclose(blocks[0], px)
        assert np.allclose(blocks[1], lam)

    def test_read_xml_file(self, tmp_path, rng):
        px = rng.normal(size=64)
        p = tmp_path / "spec.xml"
        p.write_text(make_procspec_xml(px))
        pixels, lambdas = read_procspec(p)
        assert np.allclose(pixels, px) and lambdas is None

    def test_read_procspec_zip(self, tmp_path, rng):
        import zipfile
        px = rng.normal(size=32)
        lam = np.linspace(800, 860, 32)
        p = tmp_path / "spec.ProcSpec"
        with zipfile.ZipFile(p, "w") as z:
            z.writestr("ps_12345.xml", make_procspec_xml(px, lam))
        pixels, lambdas = read_procspec(p)
        assert np.allclose(pixels, px) and np.allclose(lambdas, lam)


class TestMeasuredLambdaCalibration:
    def test_linear_signal_interpolates_exactly(self):
        # non-uniform measured λ grid (slightly chirped)
        n = 256
        lam = np.linspace(816e-9, 884e-9, n) + 1e-11 * np.sin(
            np.linspace(0, 6, n))
        tab = calibration_from_lambdas(lam, nfft=300, ndisp=100)
        k = 2 * np.pi / lam
        y = (5.0 * k + 2.0)[None]  # linear in k
        import jax.numpy as jnp
        from fdoct_tpu.ops.resample import resample_klinear
        got = np.asarray(resample_klinear(
            jnp.asarray(y - 0.0), jnp.asarray(tab["nearest_idx"]),
            jnp.asarray(tab["frac"]), compat=False))[0]
        want = 5.0 * tab["klinear"] + 2.0
        assert np.allclose(got[1:-1], want[1:-1], rtol=1e-9)

    def test_reconstruct_finds_scatterer_depth(self):
        """Synthesize a fringe on the measured λ grid; the reconstructed
        peak must sit at the expected depth bin (the cellotape bscan.m
        flow with dark/ref/sample arms)."""
        n = 512
        lam = np.linspace(816e-9, 884e-9, n)
        k = 2 * np.pi / lam
        z = 60e-6
        S = np.exp(-0.5 * ((lam - 850e-9) / 17e-9) ** 2)
        dark = np.full(n, 5.0)
        ref_arm = 0.5 * S + dark
        sample_arm = 0.25 * S + dark
        fringe = S * (1.25 + np.cos(2 * k * z)) + dark
        pi_fringe = S * (1.25 - np.cos(2 * k * z)) + dark
        mags = reconstruct_spectrometer_ascans(
            fringe[None], lam, nfft=1024, ndisp=400,
            dark=dark, ref_arm=ref_arm, sample_arm=sample_arm,
            pi_frames=pi_fringe[None])
        tab = calibration_from_lambdas(lam, 1024, 400)
        kl = tab["klinear"]
        expected_bin = z * (kl[-1] - kl[0]) / np.pi
        peak = int(np.argmax(mags[0][4:])) + 4
        assert abs(peak - expected_bin) <= 2, (peak, expected_bin)
