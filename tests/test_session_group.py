"""Session.process_group parity: the batched one-dispatch fast path must be
indistinguishable from frame-by-frame Session.process (VERDICT r1 item 5)."""

import numpy as np
import pytest

from fdoct_tpu.config import PipelineConfig
from fdoct_tpu.session import Session
from fdoct_tpu.sources.synthetic import SyntheticSource


@pytest.fixture(scope="module")
def setup():
    cfg = PipelineConfig(width=256, height=32, averages=2,
                         numfftpoints=512, numdisplaypoints=160,
                         lambdamin=816e-9, lambdamax=884e-9,
                         dtype="float64", compat=True)
    src = SyntheticSource(height=32, width=256, depths_um=(40.0, 80.0),
                          reflectivities=(0.5, 0.3), noise=0.01, seed=3)
    it = iter(src.frames())
    frames = np.stack([next(it) for _ in range(8)])
    bg = np.maximum(src.background(), 1).astype(np.float64)
    return cfg, frames, bg


def _prime(s, bg):
    import jax.numpy as jnp
    s.data_yb = jnp.asarray(bg)


class TestGroupParity:
    def test_fast_path_matches_per_frame(self, setup):
        cfg, frames, bg = setup
        s1 = Session(cfg)
        s2 = Session(cfg)
        _prime(s1, bg)
        _prime(s2, bg)
        seq = [r for f in frames if (r := s1.process(f)) is not None]
        batched = s2.process_group(frames)
        assert len(batched) == len(seq) == 4
        for a, b in zip(seq, batched):
            np.testing.assert_allclose(a.bscandb, b.bscandb, rtol=1e-12)
            np.testing.assert_array_equal(a.bscandisp, b.bscandisp)
        # state advanced identically
        assert s1.zeroisactive == s2.zeroisactive
        assert s1.indextemp == s2.indextemp == 0

    def test_dark_variant_parity(self, setup):
        cfg, frames, bg = setup
        import jax.numpy as jnp
        s1 = Session(cfg, variant="dark")
        s2 = Session(cfg, variant="dark")
        dark = jnp.full((cfg.oph, cfg.opw), 2.0, jnp.float64)
        for s in (s1, s2):
            _prime(s, bg)
            s.data_yd = dark
        seq = [r for f in frames if (r := s1.process(f)) is not None]
        batched = s2.process_group(frames)
        for a, b in zip(seq, batched):
            np.testing.assert_allclose(a.bscandb, b.bscandb, rtol=1e-12)

    def test_fallback_on_pending_capture(self, setup):
        """A pending 'b' capture routes through the per-frame path and
        still produces identical output + captured background."""
        cfg, frames, bg = setup
        s1 = Session(cfg)
        s2 = Session(cfg)
        s1.key("b")
        s2.key("b")
        seq = [r for f in frames if (r := s1.process(f)) is not None]
        batched = s2.process_group(frames)
        assert len(batched) == len(seq)
        for a, b in zip(seq, batched):
            np.testing.assert_array_equal(a.bscandisp, b.bscandisp)
        np.testing.assert_allclose(np.asarray(s1.data_yb),
                                   np.asarray(s2.data_yb))

    def test_fallback_mid_group(self, setup):
        """Entering with a half-filled accumulator falls back and stays
        correct."""
        cfg, frames, bg = setup
        s1 = Session(cfg)
        s2 = Session(cfg)
        _prime(s1, bg)
        _prime(s2, bg)
        s1.process(frames[0])
        s2.process(frames[0])
        assert s2.indextemp == 1
        seq = [r for f in frames[1:] if (r := s1.process(f)) is not None]
        batched = s2.process_group(frames[1:])
        for a, b in zip(seq, batched):
            np.testing.assert_array_equal(a.bscandisp, b.bscandisp)

    def test_uneven_batch_falls_back(self, setup):
        """A batch that is not a multiple of the averaging count still
        accumulates correctly across calls."""
        cfg, frames, bg = setup
        s1 = Session(cfg)
        s2 = Session(cfg)
        _prime(s1, bg)
        _prime(s2, bg)
        seq = [r for f in frames[:5] if (r := s1.process(f)) is not None]
        batched = s2.process_group(frames[:5])     # 5 % 2 != 0 → slow path
        assert len(batched) == len(seq) == 2
        assert s2.indextemp == 1

    def test_plugins_run_per_group(self, setup):
        cfg, frames, bg = setup

        class Probe:
            calls = 0

            def key(self, s, ch):
                return False

            def on_bscan(self, s, result):
                Probe.calls += 1

        s = Session(cfg)
        _prime(s, bg)
        s.plugins.append(Probe())
        s.process_group(frames)
        assert Probe.calls == 4
