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


class TestPerFrameNormalization:
    """donotnormalize=False on the batched fast path (round-5 VERDICT
    item 1): the reference normalizes EACH frame by its own min/max
    (BscanFFT.cpp:1123-1132; the simulator forces it on,
    BscanFFTsim.cpp:845) — process_group must match per-frame process
    even when the frames' ranges differ."""

    def test_batched_normalization_is_per_frame(self, setup):
        cfg, frames, bg = setup
        ncfg = cfg.replace(donotnormalize=False)
        # ranges differ per frame: a joint batch min/max is distinguishable
        scaled = (frames.astype(np.float64)
                  * (1.0 + 0.5 * np.arange(len(frames))[:, None, None]))
        s1 = Session(ncfg)
        s2 = Session(ncfg)
        _prime(s1, bg)
        _prime(s2, bg)
        seq = [r for f in scaled if (r := s1.process(f)) is not None]
        batched = s2.process_group(scaled)
        assert len(batched) == len(seq) == 4
        for a, b in zip(seq, batched):
            np.testing.assert_allclose(np.asarray(a.bscandb),
                                       np.asarray(b.bscandb), rtol=1e-12)
            np.testing.assert_array_equal(a.bscandisp, b.bscandisp)

    def test_pipeline_reconstruct_batched_matches_per_frame(self, setup):
        """pipeline.reconstruct on a (n,H,W) batch must equal n single-frame
        calls under donotnormalize=False (the batched form the offline and
        C-scan paths use)."""
        import jax.numpy as jnp
        from fdoct_tpu.calibration import Calibration
        from fdoct_tpu.pipeline import reconstruct
        cfg, frames, bg = setup
        ncfg = cfg.replace(donotnormalize=False)
        calib = Calibration.create(ncfg)
        pi = np.zeros_like(bg)
        scaled = (frames.astype(np.float64)
                  * (1.0 + 0.5 * np.arange(len(frames))[:, None, None]))
        batched = np.asarray(reconstruct(
            jnp.asarray(scaled), jnp.asarray(bg), jnp.asarray(pi),
            calib, ncfg, method="fused"))
        for i, f in enumerate(scaled):
            one = np.asarray(reconstruct(
                jnp.asarray(f), jnp.asarray(bg), jnp.asarray(pi),
                calib, ncfg, method="fused"))
            np.testing.assert_allclose(batched[i], one, rtol=1e-12)


def _no_fallback(s):
    """Make any per-frame fallback on ``s`` an immediate test failure."""
    def boom(raw):
        raise AssertionError("process_group fell back to per-frame process")
    s.process = boom


def _assert_ring_parity(s1, s2):
    assert s1.zeroisactive == s2.zeroisactive
    for rid in (0, 1):
        for key in ("bscan", "raw", "binned"):
            a, b = s1._rings[rid][key], s2._rings[rid][key]
            assert len(a) == len(b), (rid, key, len(a), len(b))
            for x, y in zip(a, b):
                np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                           rtol=1e-12)


class TestFastPathStatefulFlags:
    """saveframes / saveinterferograms / J-lockin stay ON the batched fast
    path (round-5 VERDICT item 3): the device math batches; ring-buffer
    fills and the subtraction display happen host-side per group.  Parity
    with the per-frame path includes the ring CONTENTS (what a later 's'
    or 'b' key consumes), not just the displayed B-scans."""

    def test_saveframes_rides_fast_path(self, setup):
        cfg, frames, bg = setup
        scfg = cfg.replace(saveframes=True)
        s1, s2 = Session(scfg), Session(scfg)
        _prime(s1, bg)
        _prime(s2, bg)
        seq = [r for f in frames if (r := s1.process(f)) is not None]
        _no_fallback(s2)
        batched = s2.process_group(frames)
        assert len(batched) == len(seq) == 4
        for a, b in zip(seq, batched):
            np.testing.assert_allclose(np.asarray(a.bscandb),
                                       np.asarray(b.bscandb), rtol=1e-12)
        _assert_ring_parity(s1, s2)
        # the inactive ring holds the LAST group's per-frame magnitudes
        inactive = s2._rings[1 if s2.zeroisactive else 0]
        assert len(inactive["bscan"]) == scfg.averages

    def test_saveinterferograms_rides_fast_path_and_feeds_b_capture(
            self, setup):
        cfg, frames, bg = setup
        scfg = cfg.replace(saveinterferograms=True)
        s1, s2 = Session(scfg), Session(scfg)
        _prime(s1, bg)
        _prime(s2, bg)
        for f in frames:
            s1.process(f)
        _no_fallback(s2)
        s2.process_group(frames)
        _assert_ring_parity(s1, s2)
        # end-to-end: the 'b' capture averages the inactive ring's binned
        # frames (BscanFFT.cpp:1003-1037) — both sessions must capture the
        # identical background from their rings
        del s2.process            # pending 'b' legitimately goes per-frame
        s1.key("b")
        s2.key("b")
        s1.process(frames[0])
        s2.process(frames[0])
        np.testing.assert_allclose(np.asarray(s1.data_yb),
                                   np.asarray(s2.data_yb), rtol=1e-12)

    def test_jlockin_rides_fast_path(self, setup, tmp_path):
        from fdoct_tpu.sinks import RunWriter
        cfg, frames, bg = setup
        sink1 = RunWriter(tmp_path / "a", "j1")
        sink2 = RunWriter(tmp_path / "b", "j2")
        s1, s2 = Session(cfg, sink=sink1), Session(cfg, sink=sink2)
        _prime(s1, bg)
        _prime(s2, bg)
        # establish jscansave at a group boundary ('j' pending → per-frame)
        s1.key("j")
        s2.key("j")
        for f in frames[:2]:
            s1.process(f)
        s2.process_group(frames[:2])
        assert s1.jlockin and s2.jlockin
        # steady-state J-lockin: s2 must stay on the one-dispatch path
        seq = [r for f in frames[2:] if (r := s1.process(f)) is not None]
        _no_fallback(s2)
        batched = s2.process_group(frames[2:])
        assert len(batched) == len(seq) == 3
        for a, b in zip(seq, batched):
            assert a.sub_disp is not None and b.sub_disp is not None
            np.testing.assert_allclose(np.asarray(a.sub_disp).astype(int),
                                       np.asarray(b.sub_disp).astype(int),
                                       atol=1)
            np.testing.assert_allclose(np.asarray(a.bscandb),
                                       np.asarray(b.bscandb), rtol=1e-12)
        # the per-group bscansub saves happened on both paths
        subs1 = sorted(p.name for p in sink1.dir.glob("bscansub*.png"))
        subs2 = sorted(p.name for p in sink2.dir.glob("bscansub*.png"))
        assert subs1 == subs2 and len(subs1) == 6  # 3 sub + 3 subc

    def test_fallback_reason_is_said_once(self, setup):
        """A disengaged fast path names its reason in the status feed,
        once (round-5 VERDICT weak-4)."""
        cfg, frames, bg = setup
        s = Session(cfg.replace(manualaveraging=True))
        _prime(s, bg)
        s.process_group(frames)
        msgs = [m for m in s.status if "manual averaging" in m]
        assert len(msgs) == 1
        s.process_group(frames)
        msgs = [m for m in s.status if "manual averaging" in m]
        assert len(msgs) == 1
