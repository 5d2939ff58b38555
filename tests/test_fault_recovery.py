"""Failure-detection / recovery tests: camera watchdog, checkpoint/resume,
dual-camera operation (the multicamtest role — the reference's two-camera
experiment collapsed to 1-2 fps, README.md:66; per-daemon rings isolate
each camera here)."""

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

needs_gxx = pytest.mark.skipif(shutil.which("g++") is None,
                               reason="no C++ toolchain")

NATIVE = Path(__file__).resolve().parents[1] / "native"


@pytest.fixture(scope="module")
def built():
    subprocess.run(["make", "-C", str(NATIVE),
                    "libfdoct_ring.so", "capture_daemon"],
                   check=True, capture_output=True, timeout=180)


@needs_gxx
class TestWatchdog:
    def test_daemon_killed_and_restarted(self, tmp_path, built):
        from fdoct_tpu.sources.camera import CameraSource
        src = CameraSource(tmp_path / "wd.ring", daemon_args=["--synthetic"],
                           width=32, height=8, fps=500.0,
                           max_restarts=2, starve_timeout_s=1.0)
        try:
            it = iter(src.frames())
            next(it)
            src.proc.kill()          # simulate a camera/daemon crash
            src.proc.wait(timeout=5)
            frame = next(it)         # watchdog must restart and recover
            assert frame.shape == (8, 32)
            assert src.restarts >= 1
        finally:
            src.close()

    def test_restart_racing_head_past_last_seq_resyncs(self, tmp_path, built):
        """The round-3 TODO edge: a writer restart whose new head races
        PAST the reader's last_seq within one poll interval used to be
        indistinguishable from progress (head never goes backwards), so an
        in-order reader silently continued mid-way into the NEW stream.
        The v4 header generation counter makes the restart unmissable."""
        from fdoct_tpu.sources.camera import RingReader, RingWriter
        path = tmp_path / "race.ring"
        w = RingWriter(path, 16, 8, nslots=16)
        for i in range(6):
            w.push(np.full((8, 16), i, np.uint8))
        r = RingReader(path)
        for i in range(6):           # consume the whole first epoch in order
            assert r.next_in_order(timeout_s=1.0)[0, 0] == i
        e0 = r.epoch
        w.close()
        # restart: the new writer re-creates the header and immediately
        # races head to 10 > last_seq == 6 before the reader polls again
        w2 = RingWriter(path, 16, 8, nslots=16)
        for i in range(10):
            w2.push(np.full((8, 16), 100 + i, np.uint8))
        try:
            # without the epoch this read returned the NEW stream's seq-7
            # frame (value 106), silently dropping its first 6 frames and
            # stitching two epochs into one sequence; with it the reader
            # resyncs and delivers the new stream from its oldest frame
            frame = r.next_in_order(timeout_s=1.0)
            assert frame[0, 0] == 100
            assert r.epoch == e0 + 1
            assert r.last_seq == 1
        finally:
            r.close()
            w2.close()

    def test_gives_up_after_max_restarts(self, tmp_path, built):
        from fdoct_tpu.sources.camera import CameraSource, RingWriter
        # ring exists but nothing ever writes (no daemon ownership)
        w = RingWriter(tmp_path / "dead.ring", 16, 8)
        w.close()
        src = CameraSource(tmp_path / "dead.ring", daemon_args=None,
                           starve_timeout_s=0.2)
        with pytest.raises(TimeoutError):
            next(iter(src.frames()))
        src.close()


@needs_gxx
class TestDualCamera:
    def test_two_daemons_stream_independently(self, tmp_path, built):
        from fdoct_tpu.sources.camera import CameraSource
        a = CameraSource(tmp_path / "a.ring", daemon_args=["--synthetic"],
                         width=32, height=8, fps=300.0)
        b = CameraSource(tmp_path / "b.ring", daemon_args=["--synthetic"],
                         width=64, height=4, fps=300.0)
        try:
            fa = next(iter(a.frames()))
            fb = next(iter(b.frames()))
            assert fa.shape == (8, 32) and fb.shape == (4, 64)
            # both keep streaming (the reference's dual-camera fps collapse
            # does not occur: each daemon owns its own device + ring)
            for _ in range(5):
                assert next(iter(a.frames())) is not None
                assert next(iter(b.frames())) is not None
        finally:
            a.close()
            b.close()


class TestCheckpointResume:
    def test_roundtrip(self, tmp_path):
        import jax.numpy as jnp
        from fdoct_tpu.config import PipelineConfig
        from fdoct_tpu.session import Session
        from fdoct_tpu.utils.checkpoint import load_session, save_session

        cfg = PipelineConfig(width=64, height=8, averages=2,
                             numfftpoints=128, numdisplaypoints=40,
                             dtype="float64")
        s = Session(cfg)
        s.data_yb = jnp.full((8, 64), 3.25)
        s.bscanthreshold = -17.0
        s.exposure_us = 4242
        s.ascanat = 5
        p = save_session(s, tmp_path / "ckpt.npz")

        s2 = load_session(p)
        assert s2.cfg == cfg
        assert np.allclose(np.asarray(s2.data_yb), 3.25)
        assert s2.bscanthreshold == -17.0
        assert s2.exposure_us == 4242 and s2.ascanat == 5

    def test_resumed_session_processes(self, tmp_path):
        from fdoct_tpu.config import PipelineConfig
        from fdoct_tpu.session import Session
        from fdoct_tpu.sources.synthetic import SyntheticSource
        from fdoct_tpu.utils.checkpoint import load_session, save_session

        cfg = PipelineConfig(width=64, height=8, averages=1,
                             numfftpoints=128, numdisplaypoints=40,
                             dtype="float64")
        src = SyntheticSource(height=8, width=64, depths_um=(20.0,))
        s = Session(cfg)
        s.key("b")
        it = iter(src.frames())
        r1 = s.process(next(it))
        p = save_session(s, tmp_path / "c2.npz")
        s2 = load_session(p)
        r2 = s2.process(next(it))
        assert np.allclose(r1.bscan, r2.bscan)  # identical state → identical output


class TestOrbaxCheckpoint:
    def test_orbax_roundtrip(self, tmp_path):
        import jax.numpy as jnp
        from fdoct_tpu.config import PipelineConfig
        from fdoct_tpu.session import Session
        from fdoct_tpu.utils.checkpoint import load_session, save_session

        cfg = PipelineConfig(width=64, height=8, averages=2,
                             numfftpoints=128, numdisplaypoints=40,
                             dtype="float32")
        s = Session(cfg)
        s.data_yb = jnp.full((8, 64), 7.5)
        s.exposure_us = 321
        p = save_session(s, tmp_path / "ck_orbax", backend="orbax")
        s2 = load_session(p, backend="orbax")
        assert s2.cfg == cfg
        assert np.allclose(np.asarray(s2.data_yb), 7.5)
        assert s2.exposure_us == 321


class TestCheckpointJlockin:
    """Round-5: cross-group J-lockin state and the live-adjusted averages
    base survive checkpoint/resume — a session resumed mid-lockin must
    keep subtracting against the SAME reference scan."""

    def _cfg(self):
        from fdoct_tpu.config import PipelineConfig
        return PipelineConfig(width=64, height=8, averages=2,
                              numfftpoints=128, numdisplaypoints=40,
                              dtype="float64")

    def test_jlockin_state_roundtrips(self, tmp_path):
        import numpy as _np
        from fdoct_tpu.session import Session
        from fdoct_tpu.sources.synthetic import SyntheticSource
        from fdoct_tpu.utils.checkpoint import load_session, save_session

        src = SyntheticSource(height=8, width=64, depths_um=(20.0,))
        s = Session(self._cfg())
        s.key("j")
        it = iter(src.frames())
        frames = [next(it) for _ in range(6)]
        for f in frames[:2]:
            s.process(f)                       # group 1 arms the lockin
        assert s.jlockin and s.jscansave is not None
        s.averages = 7                         # live-adjusted base
        p = save_session(s, tmp_path / "jl.npz")

        s2 = load_session(p)
        assert s2.jlockin is True
        assert s2.averages == 7
        _np.testing.assert_allclose(_np.asarray(s2.jscansave),
                                    _np.asarray(s.jscansave))
        # the resumed session keeps producing subtracted displays
        r = None
        for f in frames[2:4]:
            r = s2.process(f) or r
        assert r is not None and r.sub_disp is not None

    def test_old_checkpoint_without_new_keys_loads(self, tmp_path):
        """Forward compatibility: a pre-round-5 archive (no jlockin /
        jscansave / averages keys) restores with defaults intact."""
        import numpy as _np
        from fdoct_tpu.session import Session
        from fdoct_tpu.utils import checkpoint as ckpt
        from fdoct_tpu.utils.checkpoint import load_session

        s = Session(self._cfg())
        payload = ckpt._payload(s)
        for k in ("scalar_jlockin", "scalar_averages",
                  "scalar_manualaccumcount", "tensor_jscansave",
                  "tensor_manualaccum"):
            payload.pop(k, None)
        p = tmp_path / "old.npz"
        _np.savez_compressed(p, **payload)
        s2 = load_session(p)
        assert s2.jlockin is False and s2.jscansave is None
        assert s2.averages == s2.cfg.averages
        assert s2.manualaccumcount == 0

    def test_missing_core_scalar_fails_loudly(self, tmp_path):
        """A damaged archive missing a REQUIRED scalar (e.g. the save
        counter) must refuse to load — silently resuming with indexi=0
        would overwrite the previous run's saves."""
        import numpy as _np
        import pytest as _pytest
        from fdoct_tpu.session import Session
        from fdoct_tpu.utils import checkpoint as ckpt
        from fdoct_tpu.utils.checkpoint import load_session

        s = Session(self._cfg())
        payload = ckpt._payload(s)
        payload.pop("scalar_indexi")
        p = tmp_path / "damaged.npz"
        _np.savez_compressed(p, **payload)
        with _pytest.raises(KeyError):
            load_session(p)

    def test_restore_into_live_session_restarts_group(self, tmp_path):
        """load_session(session=) mid-group: the restored averagestoggle
        must not divide a stale partial accumulation (the live-'averages'
        change semantics, session.apply_config)."""
        import jax.numpy as _jnp
        from fdoct_tpu.session import Session
        from fdoct_tpu.utils.checkpoint import load_session, save_session

        saved = Session(self._cfg())
        saved.averagestoggle = 2
        p = save_session(saved, tmp_path / "gb.npz")
        live = Session(self._cfg())
        live.indextemp = 3
        live.accum = _jnp.full_like(live.accum, 9.0)
        load_session(p, session=live)
        assert live.indextemp == 0
        assert float(_jnp.max(_jnp.abs(live.accum))) == 0.0

    def test_manual_averaging_accumulator_roundtrips(self, tmp_path):
        """The manual-averaging accumulator spans 's' saves
        (BscanFFT.cpp:1399-1477); a resume mid-accumulation continues the
        SAME running sum."""
        import numpy as _np
        import jax.numpy as _jnp
        from fdoct_tpu.session import Session
        from fdoct_tpu.utils.checkpoint import load_session, save_session

        s = Session(self._cfg())
        s.manualaccum = _jnp.full_like(s.manualaccum, 2.5)
        s.manualaccumcount = 3
        p = save_session(s, tmp_path / "ma.npz")
        s2 = load_session(p)
        assert s2.manualaccumcount == 3
        _np.testing.assert_allclose(_np.asarray(s2.manualaccum), 2.5)
