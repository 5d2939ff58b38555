"""Live camera control loop tests.

The reference adjusts exposure/gain on the *running* camera from the key
loop (BscanFFT.cpp:1600-1624 SetQHYCCDParam on +/-/u/d/U/D; deferred apply
BscanFFTspin.cpp:1895-1903).  Here the counterpart is the ring header's
control block: Session key → CameraSource.set_param → fdoct_ring_set_ctrl →
daemon poll → source apply.  These tests assert the loop end to end: a key
press measurably changes subsequent frame photometry.
"""

import shutil
import subprocess
import time
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")

NATIVE = Path(__file__).resolve().parents[1] / "native"


@pytest.fixture(scope="module", autouse=True)
def build():
    subprocess.run(["make", "-C", str(NATIVE),
                    "libfdoct_ring.so", "capture_daemon"],
                   check=True, capture_output=True, timeout=180)


def _mean_of_next_frames(it, n=3, skip=2):
    """Mean brightness over the next n frames, skipping frames possibly
    generated before a control change landed."""
    for _ in range(skip):
        next(it)
    return float(np.mean([next(it).mean() for _ in range(n)]))


class TestCtrlChannel:
    def test_set_get_poll_roundtrip(self, tmp_path):
        """Host writes land in the control block; a poll consumes exactly
        one snapshot and acknowledges it."""
        import ctypes

        from fdoct_tpu.sources.camera import RingReader, RingWriter

        path = tmp_path / "ring.bin"
        w = RingWriter(path, 16, 8, nslots=4)
        r = RingReader(path)
        try:
            assert r.ctrl_acknowledged()          # nothing pending yet
            r.set_ctrl("exposure", 2500.0)
            r.set_ctrl("gain", 7.0)
            assert r.get_ctrl("exposure") == 2500.0
            assert not r.ctrl_acknowledged()
            # daemon side: poll consumes the snapshot
            vals = (ctypes.c_double * 8)()
            assert w.lib.fdoct_ring_poll_ctrl(w.h, vals) == 1
            assert vals[0] == 2500.0 and vals[1] == 7.0
            assert r.ctrl_acknowledged()
            # no re-delivery without a new write
            assert w.lib.fdoct_ring_poll_ctrl(w.h, vals) == 0
        finally:
            w.close()
            r.close()

    def test_daemon_applies_exposure(self, tmp_path):
        """Lowering exposure dims the synthetic camera's frames (counts
        scale with exposure like a real sensor)."""
        from fdoct_tpu.sources.camera import CameraSource

        src = CameraSource(tmp_path / "cam.ring", daemon_args=["--synthetic"],
                           width=64, height=16, fps=500.0)
        try:
            it = iter(src.frames())
            bright = _mean_of_next_frames(it)
            src.set_param("exposure", 250.0)      # 1/4 of the 1000 µs default
            assert src.reader.wait_ctrl_applied(timeout_s=5.0)
            dim = _mean_of_next_frames(it)
            assert dim < bright * 0.5, (bright, dim)
            # gain brings it back up
            src.set_param("gain", 300.0)          # ×4 → back to full scale
            assert src.reader.wait_ctrl_applied(timeout_s=5.0)
            regained = _mean_of_next_frames(it)
            assert regained > dim * 1.5, (dim, regained)
        finally:
            src.close()

    def test_key_press_changes_brightness(self, tmp_path):
        """The full loop the reference closes at BscanFFT.cpp:1600: pressing
        exposure keys in the Session measurably changes subsequent frames."""
        from fdoct_tpu.config import PipelineConfig
        from fdoct_tpu.session import Session
        from fdoct_tpu.sources.camera import CameraSource

        cfg = PipelineConfig(width=64, height=16, averages=1,
                             numfftpoints=128, numdisplaypoints=40,
                             exposure_us=500, dtype="float64")
        src = CameraSource(tmp_path / "cam2.ring",
                           daemon_args=["--synthetic"],
                           width=64, height=16, fps=500.0)
        try:
            s = Session(cfg, camera=src.set_param)
            src.set_param("exposure", cfg.exposure_us)   # cmd_live init push
            assert src.reader.wait_ctrl_applied(5.0)
            it = iter(src.frames())
            before = _mean_of_next_frames(it)
            for _ in range(5):                           # 500 → 1000 µs
                s.key("+")
            assert s.exposure_us == 1000
            assert src.reader.wait_ctrl_applied(5.0)
            after = _mean_of_next_frames(it)
            assert after > before * 1.5, (before, after)
            # and back down ('d' is -1000 µs, clamped at 0 for QHY)
            s.key("d")
            assert s.exposure_us == 0
            assert src.reader.wait_ctrl_applied(5.0)
            dark = _mean_of_next_frames(it)
            assert dark < 1.0, dark                      # sensor sees nothing
        finally:
            src.close()

    def test_ctrl_survives_daemon_restart(self, tmp_path):
        """After the watchdog restarts a dead daemon, the session's knobs
        are re-asserted (the reference would simply exit,
        BscanFFT.cpp:1991-1993)."""
        from fdoct_tpu.sources.camera import CameraSource

        src = CameraSource(tmp_path / "cam3.ring",
                           daemon_args=["--synthetic"],
                           width=64, height=16, fps=500.0,
                           starve_timeout_s=2.0)
        try:
            it = iter(src.frames())
            src.set_param("exposure", 250.0)
            assert src.reader.wait_ctrl_applied(5.0)
            dim = _mean_of_next_frames(it)
            src.proc.kill()                       # daemon dies
            src.proc.wait(timeout=5)
            frame = next(it)                      # watchdog restarts it
            assert frame is not None and src.restarts == 1
            assert src.reader.wait_ctrl_applied(5.0)
            still_dim = _mean_of_next_frames(it)
            assert still_dim < dim * 2.0 + 2.0, (dim, still_dim)
            assert src.reader.get_ctrl("exposure") == 250.0
        finally:
            src.close()

    def test_unseeded_slots_keep_argv_defaults_after_restart(self, tmp_path):
        """The other half of the v3 ctrl_mask merge semantics: a slot the
        host NEVER wrote (here exposure — only gain was commanded) must
        keep the daemon's argv default across a restart, not be crushed to
        the slot's 0 placeholder."""
        import subprocess

        from fdoct_tpu.sources.camera import _NATIVE_DIR, RingReader

        exe = _NATIVE_DIR / "capture_daemon"
        ring = tmp_path / "cam_m.ring"
        argv = [str(exe), str(ring), "64", "16", "8", "16", "500",
                "--synthetic", "--exposure", "1000"]
        p1 = subprocess.Popen(argv)
        try:
            r = RingReader(ring)
            assert r.latest(timeout_s=5.0) is not None
            r.set_ctrl("gain", 5.0)          # exposure slot stays unwritten
            assert r.wait_ctrl_applied(5.0)
            assert r.lib.fdoct_ring_ctrl_mask(r.h) == (1 << 1)  # gain only
        finally:
            p1.kill()
            p1.wait(timeout=5)
        p2 = subprocess.Popen(argv)          # manual respawn, same ring
        try:
            r2 = RingReader(ring)
            assert r2.latest(timeout_s=5.0) is not None
            time.sleep(0.1)
            bright = float(r2.latest(timeout_s=5.0).mean())
            # argv --exposure 1000 survived (synthetic frames bright);
            # a value-based merge would have opened at exposure 0 (black)
            assert bright > 10.0, bright
            r2.close()
            r.close()
        finally:
            p2.kill()
            p2.wait(timeout=5)

    def test_exposure_zero_survives_daemon_restart(self, tmp_path):
        """Exposure 0 is a VALID commanded value (the '-' key clamps at 0
        and the sensor goes dark); a RESTARTED daemon's startup merge must
        preserve it rather than treating 0 as unset and reopening at the
        argv default — regression for the `snap > 0` merge rule.  The
        daemon is respawned by hand with NO host re-assert, which is the
        externally-attached-daemon case the host cannot paper over."""
        import subprocess

        from fdoct_tpu.sources.camera import _NATIVE_DIR, RingReader

        exe = _NATIVE_DIR / "capture_daemon"
        ring = tmp_path / "cam0.ring"
        argv = [str(exe), str(ring), "64", "16", "8", "16", "500",
                "--synthetic", "--exposure", "1000"]
        p1 = subprocess.Popen(argv)
        try:
            r = RingReader(ring)
            assert r.latest(timeout_s=5.0) is not None
            r.set_ctrl("exposure", 0.0)
            r.set_ctrl("gain", 0.0)
            assert r.wait_ctrl_applied(5.0)
            dark = float(r.latest(timeout_s=5.0).mean())
            assert dark < 1.0, dark               # sensor sees nothing
        finally:
            p1.kill()
            p1.wait(timeout=5)
        p2 = subprocess.Popen(argv)               # manual respawn, same ring
        try:
            r2 = RingReader(ring)
            frame = r2.latest(timeout_s=5.0)
            assert frame is not None
            # give the daemon a few frames, then read steady state: without
            # the merge fix it runs at the argv default (bright, mean ~50+)
            time.sleep(0.1)
            still_dark = float(r2.latest(timeout_s=5.0).mean())
            assert still_dark < 1.0, still_dark
            r2.close()
            r.close()
        finally:
            p2.kill()
            p2.wait(timeout=5)


class TestSdkSeams:
    """The QHY / Spinnaker seams compile against the stub headers and fail
    cleanly without hardware — so the integration seam cannot rot."""

    @pytest.mark.parametrize("target,flag", [
        ("capture_daemon_qhy", "--qhy"),
        ("capture_daemon_spin", "--spinnaker"),
    ])
    def test_seam_compiles_and_fails_cleanly(self, tmp_path, target, flag):
        subprocess.run(["make", "-C", str(NATIVE), target],
                       check=True, capture_output=True, timeout=180)
        r = subprocess.run(
            [str(NATIVE / target), str(tmp_path / "s.ring"),
             "64", "16", "8", "4", "100", flag],
            capture_output=True, text=True, timeout=30)
        assert r.returncode == 1
        assert "init failed" in r.stderr


class TestBitDepth:
    def test_synthetic_16bit_frames(self, tmp_path):
        """A 16-bit ring gets real uint16 synthetic frames (the QHY 16-bit
        mode), not an 8-bit pattern half-filling the buffer."""
        from fdoct_tpu.sources.camera import CameraSource

        src = CameraSource(tmp_path / "cam16.ring",
                           daemon_args=["--synthetic"],
                           width=64, height=16, bpp=16, fps=500.0)
        try:
            frame = next(iter(src.frames()))
            assert frame.dtype == np.uint16 and frame.shape == (16, 64)
            assert frame.max() > 255          # uses the 16-bit range
            # fringe structure present (not constant/garbage)
            assert frame.std() > 1000
        finally:
            src.close()

    def test_16bit_end_to_end_session(self, tmp_path):
        """16-bit camera → ring → Session → B-scan, including the '+'
        exposure brightening at 16-bit scale (VERDICT r2 weak-6; the QHY
        16-bit mode SetQHYCCDBitsMode, BscanFFT.cpp:812)."""
        from fdoct_tpu.config import PipelineConfig
        from fdoct_tpu.session import Session
        from fdoct_tpu.sources.camera import CameraSource

        cfg = PipelineConfig(width=64, height=16, bpp=16, averages=2,
                             numfftpoints=128, numdisplaypoints=64,
                             exposure_us=500)
        src = CameraSource(tmp_path / "cam16e.ring",
                           daemon_args=["--synthetic"],
                           width=64, height=16, bpp=16, fps=500.0,
                           initial_ctrl={"exposure": 500.0, "gain": 0.0})
        try:
            s = Session(cfg, camera=src.set_param)
            assert src.reader.wait_ctrl_applied(5.0)
            it = iter(src.frames())
            before = _mean_of_next_frames(it)
            assert before > 255            # 16-bit photometry
            # a full group reconstructs from uint16 frames
            results = [r for _ in range(2)
                       if (r := s.process(next(it))) is not None]
            assert len(results) == 1
            assert results[0].bscandisp.shape == (64, 16)
            # '+' raises exposure 500 → 1000 µs: frames brighten ~2x at
            # 16-bit scale through the live control loop
            for _ in range(5):
                s.key("+")
            assert s.exposure_us == 1000
            assert src.reader.wait_ctrl_applied(5.0)
            after = _mean_of_next_frames(it)
            assert after > before * 1.5, (before, after)
        finally:
            src.close()

    def test_16bit_live_cli(self, tmp_path, monkeypatch):
        """`fdoct live` with a bpp-16 config maps to a 16-bit ring end to
        end (cli bpp>8 → ring bpp 16)."""
        import io
        import json

        from fdoct_tpu.cli import main

        monkeypatch.setattr("sys.stdin", io.StringIO(""))
        monkeypatch.setattr("select.select", lambda *a, **k: ([], [], []))
        cfgp = tmp_path / "cfg16.json"
        cfgp.write_text(json.dumps({
            "width": 64, "height": 16, "bpp": 16, "averages": 2,
            "numfftpoints": 128, "numdisplaypoints": 64,
            "dirdescr": "b16"}))
        rc = main(["live", "--config", str(cfgp),
                   "--outdir", str(tmp_path),
                   "--camera", str(tmp_path / "cam16c.ring"),
                   "--camera-fps", "300", "--frames", "4"])
        assert rc == 0
        runs = list(tmp_path.glob("*-b16"))
        assert runs, "no run directory written"


class TestZeroCopyIngest:
    def test_latest_into_matches_latest(self, tmp_path):
        """latest_into writes the same frame bytes straight into caller
        memory (the zero-copy ingest path, bench_ingest section 5)."""
        from fdoct_tpu.sources.camera import RingReader, RingWriter

        path = tmp_path / "zc.ring"
        w = RingWriter(path, 32, 8, nslots=4)
        r1 = RingReader(path)
        r2 = RingReader(path)
        try:
            frame = np.arange(256, dtype=np.uint8).reshape(8, 32)
            w.push(frame)
            a = r1.latest(timeout_s=2.0)
            out = np.empty((8, 32), np.uint8)
            assert r2.latest_into(out, timeout_s=2.0)
            np.testing.assert_array_equal(a, frame)
            np.testing.assert_array_equal(out, frame)
            # wrong-shape / wrong-dtype buffers are rejected loudly
            with pytest.raises(AssertionError):
                r2.latest_into(np.empty((8, 32), np.uint16))
        finally:
            w.close()
            r1.close()
            r2.close()


def test_set_param_trigger_never_reasserted(tmp_path):
    """The trigger pulse COUNTER is consumable, not a knob: set_param must
    route it through trigger() and keep it out of the restart re-assert
    state — re-asserting a cumulative count after a daemon restart would
    fire that many spurious pulses."""
    from fdoct_tpu.sources.camera import CameraSource, RingWriter

    ring = tmp_path / "trigring"
    w = RingWriter(ring, 16, 8)
    try:
        src = CameraSource(ring, daemon_args=None, starve_timeout_s=0.5)
        try:
            src.set_param("exposure", 123)
            src.set_param("trigger", 3)
            assert "trigger" not in src._ctrl_state
            assert src._ctrl_state["exposure"] == 123
            assert src.reader.get_ctrl("trigger") == 3   # pulses DID fire
            src.set_param("trigger", 2)
            assert src.reader.get_ctrl("trigger") == 5   # incremented
        finally:
            src.close()
    finally:
        w.close()
