"""Volume analysis tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from fdoct_tpu.volume import ascan_peaks, enface_projection, surface_map


@pytest.fixture()
def volume():
    """(4 frames, 64 depths, 16 laterals) with a bright surface whose depth
    increases with frame index and lateral position."""
    F, D, L = 4, 64, 16
    vol = np.random.default_rng(0).uniform(0, 0.1, (F, D, L))
    for f in range(F):
        for x in range(L):
            d = 10 + 2 * f + x // 4
            vol[f, d, x] = 5.0          # surface voxel
            vol[f, d + 8, x] = 2.0      # deeper layer
    vol[:, :5, :] = 50.0                # DC junk that must be ignored
    return jnp.asarray(vol)


class TestAscanPeaks:
    def test_peaks_ignore_dc(self, volume):
        idx, val = ascan_peaks(volume[0])
        assert np.all(np.asarray(idx) >= 5)
        assert np.allclose(np.asarray(val), 5.0)

    def test_peak_positions(self, volume):
        idx, _ = ascan_peaks(volume[2])
        assert int(idx[0]) == 14 and int(idx[15]) == 17


class TestEnface:
    def test_max_projection(self, volume):
        en = np.asarray(enface_projection(volume, "max"))
        assert en.shape == (4, 16)
        assert np.allclose(en, 5.0)

    def test_slab_excludes_surface(self, volume):
        en = np.asarray(enface_projection(volume, "max", depth_range=(30, 64)))
        assert en.max() < 5.0  # surface (depth<30) excluded

    def test_mean_and_sum(self, volume):
        m = np.asarray(enface_projection(volume, "mean"))
        s = np.asarray(enface_projection(volume, "sum"))
        assert np.allclose(s, m * (64 - 5), rtol=1e-6)

    def test_bad_mode(self, volume):
        with pytest.raises(ValueError):
            enface_projection(volume, "median")


class TestSurface:
    def test_topography_follows_surface(self, volume):
        surf = np.asarray(surface_map(volume))
        assert surf.shape == (4, 16)
        # increases with frame index and lateral position
        assert surf[0, 0] == 10 and surf[3, 15] == 19
        assert np.all(np.diff(surf, axis=0) >= 0)
