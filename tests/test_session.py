"""Session state-machine tests: averaging, captures, key dispatch, saves."""

import numpy as np
import pytest

from fdoct_tpu.config import PipelineConfig
from fdoct_tpu.session import Session
from fdoct_tpu.sinks import RunWriter
from fdoct_tpu.sources.synthetic import SyntheticSource


@pytest.fixture()
def cfg():
    return PipelineConfig(width=128, height=16, binvalue=1, averages=3,
                          numfftpoints=256, numdisplaypoints=80,
                          dtype="float64", compat=True)


@pytest.fixture()
def src(cfg):
    return SyntheticSource(height=cfg.height, width=cfg.width,
                           depths_um=(40.0,), reflectivities=(0.5,))


def feed(session, src, n):
    results = []
    it = iter(src.frames())
    for _ in range(n):
        r = session.process(next(it))
        if r is not None:
            results.append(r)
    return results


class TestAveraging:
    def test_group_every_n_frames(self, cfg, src):
        s = Session(cfg)
        results = feed(s, src, 7)
        assert len(results) == 2  # 7 frames / averages=3 → 2 complete groups

    def test_averagestoggle_key(self, cfg, src):
        s = Session(cfg)
        s.key("a")  # averages → 1
        assert s.averagestoggle == 1
        results = feed(s, src, 4)
        assert len(results) == 4
        s.key("a")  # back to 3
        assert s.averagestoggle == 3

    def test_average_reduces_noise(self, cfg):
        import jax.numpy as jnp
        noisy = SyntheticSource(height=cfg.height, width=cfg.width,
                                depths_um=(40.0,), noise=0.05, seed=1)
        s1 = Session(cfg.replace(averages=1))
        s16 = Session(cfg.replace(averages=16))
        bg = noisy.background().astype(np.float64)
        for s in (s1, s16):
            s.data_yb = jnp.asarray(np.maximum(bg, 1.0))
        r1 = feed(s1, noisy, 1)[0]
        r16 = feed(s16, noisy, 16)[0]
        # noise floor (std of a signal-free deep region) drops with averaging
        floor1 = r1.bscan[50:75].std()
        floor16 = r16.bscan[50:75].std()
        assert floor16 < floor1


class TestCaptures:
    def test_background_capture_accumulates(self, cfg, src):
        s = Session(cfg)
        s.key("b")
        feed(s, src, 3)
        # background = mean of 3 identical frames = the frame itself
        frame = next(iter(src.frames())).astype(np.float64)
        assert np.allclose(np.asarray(s.data_yb), frame, atol=1e-9)

    def test_pi_capture(self, cfg, src):
        s = Session(cfg)
        s.key("p")
        feed(s, src, 1)
        frame = next(iter(src.frames())).astype(np.float64)
        assert np.allclose(np.asarray(s.data_yp), frame)

    def test_background_capture_from_ring(self, cfg, src, tmp_path):
        """With saveinterferograms on, 'b' averages the formerly-active
        ring buffer and saves rawframeb PNGs (BscanFFT.cpp:1003-1037)."""
        from fdoct_tpu.sinks import RunWriter
        cfg2 = cfg.replace(saveinterferograms=True)
        sink = RunWriter(tmp_path, "ringbg")
        s = Session(cfg2, sink=sink)
        feed(s, src, 3)          # fill group 1 → becomes the inactive ring
        s.key("b")
        feed(s, src, 1)          # capture consumes the ring immediately
        frame = next(iter(src.frames())).astype(np.float64)
        assert np.allclose(np.asarray(s.data_yb), frame, atol=1e-9)
        assert (sink.dir / "rawframeb000-000.png").exists()

    def test_sim_variant_reads_source_calibration(self, cfg, src):
        s = Session(cfg, variant="sim", source=src)
        s.key("b")
        s.key("p")
        feed(s, src, 1)
        assert np.allclose(np.asarray(s.data_yb), src.background().astype(float))
        assert np.allclose(np.asarray(s.data_yp), src.pi_frame().astype(float))

    def test_dark_variant_composes_background(self, cfg, src):
        cfgd = cfg.replace(averages=2)
        s = Session(cfgd, variant="dark")
        s.key("o")  # dark
        feed(s, src, 2)
        s.key("r")  # reference arm
        feed(s, src, 2)
        s.key("t")  # sample arm
        feed(s, src, 2)
        frame = next(iter(src.frames())).astype(np.float64)
        # all three captures identical → data_yb = (f-f)+(f-f) = 0 → guarded to 1
        assert np.allclose(np.asarray(s.data_yb), 1.0)
        assert np.allclose(np.asarray(s.data_yd), frame)


class TestJLockin:
    def test_j_then_c(self, cfg, src):
        s = Session(cfg)
        s.key("j")
        r1 = feed(s, src, 3)[0]
        assert s.jlockin and s.jscansave is not None
        r2 = feed(s, src, 3)[0]
        assert r2.sub_disp is not None  # subtracted frame produced
        s.key("c")
        feed(s, src, 3)
        assert not s.jlockin

    def test_identical_frames_subtract_to_floor(self, cfg, src):
        s = Session(cfg)
        s.key("j")
        feed(s, src, 3)
        r = feed(s, src, 3)[0]
        # same frames → jdiff == 0 → sub image is flat (all equal after norm)
        assert r.sub_disp is not None


class TestKeys:
    def test_exposure_keys(self, cfg):
        calls = []
        s = Session(cfg, camera=lambda p, v: calls.append((p, v)))
        s.key("+"); s.key("u"); s.key("U"); s.key("d")
        assert s.exposure_us == cfg.exposure_us + 100 + 1000 + 10000 - 1000
        assert calls[-1] == ("exposure", s.exposure_us)
        for _ in range(100):
            s.key("D")
        assert s.exposure_us == 0  # clamped at 0

    def test_threshold_and_ascan_keys(self, cfg):
        s = Session(cfg)
        s.key("]"); s.key("]"); s.key("[")
        assert s.bscanthreshold == cfg.bscanthreshold + 1.0
        # reference semantics: '0'/')' are guarded by oph (BscanFFT.cpp:1801-1822)
        s.ascanat = 3
        s.key("0")   # 3 → 4
        s.key(")")   # 4 → 14 (oph=16, 4 < oph-11)
        assert s.ascanat == 14
        s.key("9")   # → 13
        s.key("(")   # → 3
        assert s.ascanat == 3
        s.key("x")
        assert s.done

    def test_roi_keys(self, cfg):
        s = Session(cfg)
        s.ascanat = 0  # 'W' is guarded by ascanat+widthROI < oph-1
        s.key("W"); s.key("W"); s.key("w")
        assert s.widthROI == 11
        s.key("h"); s.key("H"); s.key("H")
        assert s.vertposROI == 9
        s.key("q")
        assert s.clampupper
        assert s.cfg.clampupper      # the toggle must reach form_bscan's cfg
        s.key("e")
        assert s.ROIreport

    def test_clampupper_key_changes_display(self, cfg):
        """Regression: 'q' used to flip a session attribute nothing read —
        the display never clamped.  Now the toggle rides cfg and pixel
        (5,5) is pinned to clampupperdb before normalization
        (BscanFFT.cpp:1248-1253), so it renders as the display maximum."""
        import numpy as np
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (cfg.averages, cfg.oph, cfg.opw)
                              ).astype(np.uint8)
        # a clamp level far above the data so the pinned pixel IS the max
        s = Session(cfg.replace(clampupperdb=200.0))
        s.key("q")
        out = [r for f in frames if (r := s.process(f)) is not None]
        assert len(out) == 1
        assert out[0].bscandisp[5, 5] == out[0].bscandisp.max() == 255


class TestSaves:
    def test_save_key_writes_run_dir(self, cfg, src, tmp_path):
        sink = RunWriter(tmp_path, "testrun", fmt="m")
        s = Session(cfg, sink=sink)
        s.key("s")
        feed(s, src, 3)
        s.close()
        files = {p.name for p in sink.dir.iterdir()}
        assert "bscan001.png" in files and "bscanc001.png" in files
        m = (sink.dir / "BscanFFT.m").read_text()
        assert "bscan001=[" in m
        assert "% Parameters were" in m

    def test_saveframes_and_interferograms(self, cfg, src, tmp_path):
        cfg2 = cfg.replace(saveframes=True, saveinterferograms=True)
        sink = RunWriter(tmp_path, "t2", fmt="m")
        s = Session(cfg2, sink=sink)
        feed(s, src, 3)     # fill group 1 (becomes inactive ring)
        s.key("s")
        feed(s, src, 3)     # group 2 completes; saves inactive (group 1)
        s.close()
        files = {p.name for p in sink.dir.iterdir()}
        assert "bscan001-000.png" in files
        assert "rawframe001-000.png" in files

    def test_manual_averaging(self, cfg, src, tmp_path):
        cfg2 = cfg.replace(manualaveraging=True, manualaverages=2)
        sink = RunWriter(tmp_path, "t3", fmt="m")
        s = Session(cfg2, sink=sink)
        for _ in range(3):
            s.key("s")
            feed(s, src, 3)
        s.close()
        files = {p.name for p in sink.dir.iterdir()}
        assert any(f.startswith("bscanman") for f in files)

    def test_npz_sink(self, cfg, src, tmp_path):
        sink = RunWriter(tmp_path, "t4", fmt="npz")
        s = Session(cfg, sink=sink)
        s.key("s")
        feed(s, src, 3)
        s.close()
        import numpy as np
        data = np.load(sink.dir / "BscanFFT.npz")
        assert "bscan001" in data


class TestSimCopyToStrict:
    """Strict simulator averaging emulation (cfg.simcopyto): the sim's
    copyTo-instead-of-accumulate slot (BscanFFTsim.cpp:935-947) keeps only
    the last frame of a group, drops the group-completing frame, skips the
    ÷averages, and uses the 1e-6 log guard (BscanFFTsim.cpp:949)."""

    def _cfg(self, **kw):
        return PipelineConfig(width=128, height=16, binvalue=1, averages=3,
                              numfftpoints=256, numdisplaypoints=80,
                              dtype="float64", compat=True, **kw)

    def test_group_spans_averages_plus_one_frames(self):
        cfg = self._cfg(simcopyto=True)
        src = SyntheticSource(height=cfg.height, width=cfg.width,
                              depths_um=(40.0,), reflectivities=(0.5,))
        s = Session(cfg, variant="sim")
        results = feed(s, src, 8)
        # strict groups take averages+1 = 4 frames each → 2 groups in 8
        assert len(results) == 2

    def test_only_last_copied_frame_survives_no_division(self):
        import jax.numpy as jnp

        from fdoct_tpu.pipeline import (
            apodize_ratio, ascan_mags, form_bscan, preprocess)

        cfg = self._cfg(simcopyto=True)
        s = Session(cfg, variant="sim")
        rng = np.random.default_rng(7)
        frames = [rng.integers(1, 255, (16, 128)).astype(np.uint8)
                  for _ in range(4)]
        rs = [s.process(f) for f in frames]
        assert rs[:3] == [None, None, None] and rs[3] is not None

        # oracle: frame index 2 (the last one copied) alone, eps 1e-6, ÷1
        y = preprocess(jnp.asarray(frames[2]), cfg)
        yr = apodize_ratio(y, s.data_yb, s.data_yp, cfg)
        mags = ascan_mags(yr, s.calib, s.method)
        want = form_bscan(mags, cfg, 1, bscanthreshold=s.bscanthreshold,
                          eps=1e-6)
        np.testing.assert_allclose(rs[3].bscandb, np.asarray(want.bscandb),
                                   rtol=1e-12)

    def test_default_sim_accumulates_like_live_app(self):
        cfg = self._cfg()
        src = SyntheticSource(height=cfg.height, width=cfg.width,
                              depths_um=(40.0,), reflectivities=(0.5,))
        s = Session(cfg, variant="sim")
        results = feed(s, src, 6)
        assert len(results) == 2  # averages=3 → groups every 3 frames
