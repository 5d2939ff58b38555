"""Unit tests for the op library against the independent NumPy oracle
(tests/oracle.py) and SciPy."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.ndimage
import scipy.signal

from fdoct_tpu import ops
import oracle


class TestWindows:
    def test_barthann_matches_oracle(self):
        w = np.asarray(ops.barthann(128))
        assert np.allclose(w, oracle.barthann(128), atol=1e-12)

    def test_barthann_endpoints(self):
        # modified Bartlett-Hann: w(0) = 0.62 - 0.24 + 0.38*cos(-π) = 0
        w = np.asarray(ops.barthann(64))
        assert abs(w[0]) < 1e-12 and abs(w[-1]) < 1e-12
        assert abs(w[:].max() - 1.0) < 5e-3  # peak ~1 near centre (even n)

    @pytest.mark.parametrize("kind,ref", [
        ("hann", lambda n: scipy.signal.windows.hann(n, sym=True)),
        ("hamming", lambda n: scipy.signal.windows.hamming(n, sym=True)),
        ("blackmanharris", lambda n: scipy.signal.windows.blackmanharris(n, sym=True)),
        ("tukey", lambda n: scipy.signal.windows.tukey(n, 0.5, sym=True)),
    ])
    def test_vs_scipy(self, kind, ref):
        w = np.asarray(ops.get_window(kind, 101))
        assert np.allclose(w, ref(101), atol=1e-8)

    def test_gaussian(self):
        w = np.asarray(ops.gaussian(65, sigma=0.4))
        assert w[32] == pytest.approx(1.0)
        assert np.allclose(w, w[::-1])


class TestFilters:
    def test_smoothmovavg_matches_oracle(self, rng):
        x = rng.normal(size=(7, 33))
        for n in (1, 2, 5):
            got = np.asarray(ops.smooth_moving_average(jnp.asarray(x), n))
            want = oracle.smoothmovavg(x, n)
            assert np.allclose(got, want, atol=1e-12), f"n={n}"

    def test_smoothmovavg_constant_preserved(self):
        x = jnp.full((3, 20), 7.5)
        out = ops.smooth_moving_average(x, 3)
        assert np.allclose(out, 7.5)

    def test_smoothmovavg_batched(self, rng):
        x = rng.normal(size=(2, 3, 17))
        got = np.asarray(ops.smooth_moving_average(jnp.asarray(x), 2))
        for b in range(2):
            assert np.allclose(got[b], oracle.smoothmovavg(x[b], 2), atol=1e-12)

    @pytest.mark.parametrize("k", [3, 5])
    def test_median_blur_vs_scipy(self, rng, k):
        img = rng.integers(0, 255, size=(24, 31)).astype(np.float64)
        got = np.asarray(ops.median_blur(jnp.asarray(img), k))
        want = scipy.ndimage.median_filter(img, size=k, mode="nearest")
        assert np.array_equal(got, want)

    def test_median_blur_identity(self, rng):
        img = jnp.asarray(rng.normal(size=(8, 8)))
        assert np.array_equal(ops.median_blur(img, 1), img)

    def test_bin_area_float(self, rng):
        img = rng.normal(size=(12, 16))
        got = np.asarray(ops.bin_area(jnp.asarray(img), 4, 2))
        want = img.reshape(6, 2, 4, 4).mean(axis=(1, 3))
        assert np.allclose(got, want)

    def test_bin_area_integer_rounds(self):
        img = jnp.asarray([[0, 1], [2, 2]], dtype=jnp.uint8)  # mean 1.25 → 1
        out = ops.bin_area(img, 2)
        assert out.dtype == jnp.uint8 and int(out[0, 0]) == 1

    def test_bscan_rebin_roundtrip_shape(self, rng):
        from fdoct_tpu.ops.filters import bscan_rebin
        x = jnp.asarray(rng.normal(size=(32, 40)))
        out = bscan_rebin(x, 2, 2, multiplyfactor=1.0)
        assert out.shape == x.shape

    def test_cv_cubic_weights_partition_unity(self):
        from fdoct_tpu.ops.filters import _cv_cubic_matrix
        W = _cv_cubic_matrix(16, 48)
        assert np.allclose(W.sum(axis=1), 1.0, atol=1e-12)

    def test_cv_cubic_matches_scalar_oracle(self):
        """The matrix implementation must equal a direct scalar evaluation
        of the OpenCV INTER_CUBIC formula (a=-0.75, half-pixel centres,
        clamped borders)."""
        from fdoct_tpu.ops.filters import resize_bicubic
        a = -0.75
        n_in, n_out = 13, 40
        rng = np.random.default_rng(5)
        row = rng.normal(size=n_in)

        def kern(x):
            x = abs(x)
            if x <= 1:
                return (a + 2) * x**3 - (a + 3) * x**2 + 1
            if x < 2:
                return a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a
            return 0.0

        want = np.zeros(n_out)
        for d in range(n_out):
            src = (d + 0.5) * n_in / n_out - 0.5
            i0 = int(np.floor(src))
            t = src - i0
            for o in (-1, 0, 1, 2):
                want[d] += kern(t - o) * row[min(max(i0 + o, 0), n_in - 1)]
        got = np.asarray(resize_bicubic(jnp.asarray(row)[None], 1, n_out))[0]
        assert np.allclose(got, want, atol=1e-12)

    def test_cv_cubic_overshoot_sharper_than_keys(self):
        """a=-0.75 undershoots a step harder than Keys a=-0.5 — proves we
        are not silently using jax.image's kernel."""
        import jax
        from fdoct_tpu.ops.filters import resize_bicubic
        step = jnp.asarray(np.r_[np.zeros(16), np.ones(16)])[None]
        ours = np.asarray(resize_bicubic(step[None], 1, 128))[0, 0]
        keys = np.asarray(jax.image.resize(step, (1, 128), method="cubic"))[0]
        assert ours.min() < keys.min() - 1e-4


class TestFftOps:
    def test_zeropad_matches_oracle(self, rng):
        x = rng.normal(size=(5, 64))
        for mult in (2, 4):
            got = np.asarray(ops.zeropad_rowwise(jnp.asarray(x), mult))
            want = oracle.zeropadrowwise(x, mult)
            assert np.allclose(got, want, atol=1e-9), f"mult={mult}"

    def test_zeropad_resamples_sinusoid(self):
        # a band-limited signal upsampled 4x must pass through the original
        # samples (sinc interpolation property)
        n, mult = 64, 4
        t = np.arange(n)
        x = np.cos(2 * np.pi * 5 * t / n) + 0.5 * np.sin(2 * np.pi * 11 * t / n)
        up = np.asarray(ops.zeropad_rowwise(jnp.asarray(x[None]), mult))[0]
        assert np.allclose(up[::mult], x, atol=1e-9)

    def test_zeropad_bandpass_matches_oracle(self, rng):
        x = rng.normal(size=(3, 60))
        got = np.asarray(ops.zeropad_rowwise(jnp.asarray(x), 2, bandpassfilter=True))
        want = oracle.zeropadrowwise(x, 2, bandpass=True)
        assert np.allclose(got, want, atol=1e-9)

    def test_lowpass_matches_oracle(self, rng):
        x = rng.normal(size=(4, 50))
        got = np.asarray(ops.lowpass_rowwise(jnp.asarray(x)))
        assert np.allclose(got, oracle.lpfilter(x), atol=1e-9)

    def test_lowpass_kills_high_freq(self):
        n = 100
        t = np.arange(n)
        lo = np.cos(2 * np.pi * 3 * t / n)
        hi = np.cos(2 * np.pi * 30 * t / n)
        out = np.asarray(ops.lowpass_rowwise(jnp.asarray((lo + hi)[None])))[0]
        # the 30-cycle component is outside ±n/10 bins and must vanish
        assert np.abs(np.fft.fft(out)[30]) < 1e-6
        assert np.abs(np.fft.fft(out)[3]) > n / 4

    def test_ifft_mag_matches_oracle(self, rng):
        x = rng.normal(size=(6, 48))
        got = np.asarray(ops.ifft_mag_rows(jnp.asarray(x)))
        assert np.allclose(got, oracle.ifft_mag(x), atol=1e-9)

    def test_ifft_mag_nonpow2(self, rng):
        x = rng.normal(size=(2, 2560))  # the reference's favourite size
        got = np.asarray(ops.ifft_mag_rows(jnp.asarray(x)))
        assert np.allclose(got, oracle.ifft_mag(x), atol=1e-7)


class TestScale:
    def test_to_db_compat_constant(self):
        x = jnp.asarray([[10.0]])
        # 20*ln(10+1e-5)/2.303 — the reference's 2.303, not ln(10)
        want = 20 * np.log(10 + 1e-5) / 2.303
        assert np.allclose(ops.to_db(x), want)

    def test_normalize_minmax(self, rng):
        x = jnp.asarray(rng.normal(size=(5, 7)))
        out = np.asarray(ops.normalize_minmax(x, 0.0, 1.0))
        assert out.min() == pytest.approx(0.0) and out.max() == pytest.approx(1.0)

    def test_normalize_constant_input(self):
        x = jnp.full((3, 3), 2.0)
        out = ops.normalize_minmax(x, 0.25, 1.0)
        assert np.allclose(out, 0.25)

    def test_normalize_rows(self, rng):
        x = jnp.asarray(rng.normal(size=(4, 9)))
        out = np.asarray(ops.normalize_rows(x, 0.0, 1.0))
        assert np.allclose(out.min(axis=1), 0) and np.allclose(out.max(axis=1), 1)

    def test_mask_dc_rows(self, rng):
        from fdoct_tpu.ops.scale import mask_dc_rows
        x = jnp.asarray(rng.normal(size=(10, 6)))
        out = np.asarray(mask_dc_rows(x))
        assert np.array_equal(out[0], np.asarray(x[4]))
        assert np.array_equal(out[1], np.asarray(x[4]))
        assert np.array_equal(out[2:], np.asarray(x[2:]))

    def test_to_uint8(self):
        out = np.asarray(ops.to_uint8(jnp.asarray([0.0, 0.5, 1.0, 1.5, -1.0])))
        assert list(out) == [0, 128, 255, 255, 0]


class TestHilbert:
    def test_analytic_signal_vs_scipy(self, rng):
        x = rng.normal(size=(3, 64))
        got = np.asarray(ops.analytic_signal(jnp.asarray(x)))
        want = scipy.signal.hilbert(x, axis=-1)
        assert np.allclose(got, want, atol=1e-9)


class TestDispersion:
    def test_zero_phase_is_identity(self, rng):
        from fdoct_tpu.ops.dispersion import dispersion_phase, apply_dispersion
        kl = jnp.linspace(1.0, 2.0, 32)
        ph = dispersion_phase(kl, 0.0, 0.0)
        x = jnp.asarray(rng.normal(size=(4, 32)))
        assert np.allclose(np.asarray(apply_dispersion(x, ph)), x)

    def test_sweep_recovers_coefficient(self):
        from fdoct_tpu.ops.dispersion import (
            dispersion_phase, apply_dispersion, dispersion_sweep)
        # synthesize a chirped fringe with known a2, sweep must undo it
        n = 256
        kl = jnp.linspace(1.0, 2.0, n)
        depth_cycles = 20.0
        base = jnp.cos(2 * jnp.pi * depth_cycles * jnp.arange(n) / n)
        a2_true = 6.0
        blurred = apply_dispersion(base[None], dispersion_phase(kl, a2_true)).real
        grid = jnp.linspace(-10.0, 10.0, 41)
        scores, best = dispersion_sweep(jnp.asarray(blurred), kl, grid, ndisp=n // 2)
        assert float(best) == pytest.approx(-a2_true, abs=0.5)
