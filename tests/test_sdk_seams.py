"""SDK-seam execution tests (VERDICT r2 items 3-5): with FDOCT_STUB_FAKE=1
the stub headers attach a fake camera, so the QHY / Spinnaker daemons run
their REAL init → stream → apply_ctrl → shutdown code paths in CI — and the
trigger seam (ConfigureTrigger / GrabNextImageByTrigger / ResetTrigger,
reference BscanFFTspinj.cpp:123-256) gates frames end to end.

Each daemon is also run under ASan (make seams_asan) for leak/overflow
coverage of the seam loop.
"""

import os
import signal
import subprocess
import time
from pathlib import Path

import numpy as np
import pytest

from fdoct_tpu.sources.camera import RingReader, _NATIVE_DIR

pytestmark = pytest.mark.skipif(
    not (_NATIVE_DIR / "Makefile").exists(), reason="native tree absent")


def _build(target: str) -> Path:
    exe = _NATIVE_DIR / target
    if not exe.exists():
        subprocess.run(["make", "-C", str(_NATIVE_DIR), target],
                       check=True, capture_output=True, timeout=180)
    return exe


def _spawn(exe: Path, ring: Path, args: list[str], bpp: int = 8,
           w: int = 64, h: int = 32, fps: float = 200.0):
    env = dict(os.environ, FDOCT_STUB_FAKE="1")
    return subprocess.Popen(
        [str(exe), str(ring), str(w), str(h), str(bpp), "8", str(fps)] + args,
        env=env, stderr=subprocess.PIPE, text=True)


def _stop(proc) -> tuple[int, str]:
    proc.send_signal(signal.SIGTERM)
    try:
        rc = proc.wait(timeout=10)
    except subprocess.TimeoutExpired:
        proc.kill()
        rc = proc.wait(timeout=10)
    return rc, proc.stderr.read()


@pytest.mark.parametrize("target,mode,stub", [
    ("capture_daemon_qhy", "--qhy", "qhy-stub"),
    ("capture_daemon_spin", "--spinnaker", "spin-stub"),
])
class TestFakeSeams:
    def test_stream_control_and_clean_shutdown(self, tmp_path, target, mode,
                                               stub):
        """Full seam loop: fake init chain → frames reach the ring → an
        exposure change through the control block measurably brightens
        frames (through the real apply_ctrl SDK calls) → SIGTERM runs the
        SDK close chain and exits 0."""
        exe = _build(target)
        ring = tmp_path / "ring"
        proc = _spawn(exe, ring, [mode, "--exposure", "400", "--gain", "0"])
        try:
            r = RingReader(ring)
            f1 = r.latest(timeout_s=5.0)
            assert f1 is not None and f1.shape == (32, 64)
            r.set_ctrl("exposure", 900.0)
            assert r.wait_ctrl_applied(3.0)
            time.sleep(0.1)
            f2 = r.latest(timeout_s=5.0)
            assert f2 is not None
            assert f2.mean() > f1.mean() * 1.5, (f1.mean(), f2.mean())
            r.close()
        finally:
            rc, err = _stop(proc)
        assert rc == 0, err
        assert stub in err

    def test_geometry_reaches_sdk(self, tmp_path, target, mode, stub):
        """Configured ini geometry must reach the SDK calls (VERDICT r2
        missing-2): the stub echoes every applied node/param."""
        exe = _build(target)
        ring = tmp_path / "ring"
        proc = _spawn(exe, ring, [
            mode, "--offsetx", "24", "--offsety", "12", "--camspeed", "3",
            "--usbtraffic", "35", "--cambinx", "2", "--cambiny", "2"])
        try:
            r = RingReader(ring)
            assert r.latest(timeout_s=5.0) is not None
            r.close()
        finally:
            rc, err = _stop(proc)
        assert rc == 0, err
        if stub == "qhy-stub":
            # SetQHYCCDResolution(offsetx, offsety, w, h) +
            # CONTROL_USBTRAFFIC(10)/CONTROL_SPEED(9) (BscanFFT.cpp:808-871)
            assert "resolution offx=24 offy=12 w=64 h=32" in err
            assert "param 10 = 35" in err
            assert "param 9 = 3" in err
        else:
            # OffsetX/Y, Width/Height, PixelFormat, AcquisitionFrameRate
            # (BscanFFTspin.cpp:824-1015)
            assert "OffsetX = 24" in err and "OffsetY = 12" in err
            assert "Width = 64" in err and "Height = 32" in err
            assert "PixelFormat = Mono8" in err
            assert "AcquisitionFrameRate = 3" in err
            assert "BinningHorizontal = 2" in err


def _frames_pushed(reader) -> int:
    """Total frames the daemon has pushed (the ring head counter) — counts
    every frame, unlike latest() which skips to the newest."""
    return reader.lib.fdoct_ring_head(reader.h)


def _settle(reader, expect: int, timeout_s: float = 5.0) -> int:
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if _frames_pushed(reader) >= expect:
            break
        time.sleep(0.02)
    time.sleep(0.3)   # would-be extra frames get a chance to appear
    return _frames_pushed(reader)


class TestTriggerSeam:
    @pytest.mark.parametrize("target,mode", [
        ("capture_daemon", "--synthetic"),
        ("capture_daemon_spin", "--spinnaker"),
    ])
    def test_sw_trigger_gates_frames(self, tmp_path, target, mode):
        """--trigger sw: no frames until the host fires pulses; then exactly
        one frame per pulse (GrabNextImageByTrigger semantics).  Runs for
        the synthetic source (pure daemon logic) AND through the Spinnaker
        seam, where it executes the GenICam TriggerSoftware command against
        the fake camera."""
        exe = _build(target)
        ring = tmp_path / "ring"
        proc = _spawn(exe, ring, [mode, "--trigger", "sw"])
        try:
            r = RingReader(ring)
            time.sleep(0.7)
            assert _frames_pushed(r) == 0               # gated: no pulses
            r.trigger(3)
            assert _settle(r, 3) == 3                   # one frame per pulse
            r.trigger(1)
            assert _settle(r, 4) == 4
            r.close()
        finally:
            rc, err = _stop(proc)
        assert rc == 0, err
        if mode == "--spinnaker":
            # ConfigureTrigger ran: Off → Software → On (spinj.cpp:123-189)
            assert "TriggerSource = Software" in err
            assert "TriggerMode = On" in err
            # ResetTrigger at shutdown (spinj.cpp:232-256)
            assert err.rindex("TriggerMode = Off") > err.index("TriggerMode = On")

    def test_hw_trigger_spinnaker(self, tmp_path):
        """--trigger hw on the Spinnaker seam: TriggerSource=Line0, frames
        arrive as (fake) hardware pulses fire — no host counter needed."""
        exe = _build("capture_daemon_spin")
        ring = tmp_path / "ring"
        proc = _spawn(exe, ring, ["--spinnaker", "--trigger", "hw"])
        try:
            r = RingReader(ring)
            assert r.latest(timeout_s=5.0) is not None
            r.close()
        finally:
            rc, err = _stop(proc)
        assert rc == 0, err
        assert "TriggerSource = Line0" in err

    def test_trig_pulses_survive_restart(self, tmp_path):
        """The trigger counter lives in the ring's preserved control block;
        a restarted daemon must not replay already-consumed pulses."""
        exe = _build("capture_daemon")
        ring = tmp_path / "ring"
        proc = _spawn(exe, ring, ["--synthetic", "--trigger", "sw"])
        try:
            r = RingReader(ring)
            r.trigger(2)
            assert _settle(r, 2) == 2
        finally:
            rc, err = _stop(proc)
        assert rc == 0, err
        proc2 = _spawn(exe, ring, ["--synthetic", "--trigger", "sw"])
        try:
            time.sleep(0.6)   # restart re-creates the ring: head resets to 0
            assert _frames_pushed(r) == 0   # old pulses not replayed
            r.trigger(1)
            assert _settle(r, 1) == 1
            r.close()
        finally:
            rc, err = _stop(proc2)
        assert rc == 0, err


class TestSessionTriggerFlow:
    def test_t_key_fires_pulses_through_daemon(self, tmp_path):
        """Session 't' with a trigger-mode daemon attached: the key fires
        manualaverages pulses, the daemon emits exactly that many frames,
        and the Trig PNGs land — the full BscanFFTspinj t-flow
        (:1695-1705) against the real seam."""
        from fdoct_tpu.config import PipelineConfig
        from fdoct_tpu.session import Session
        from fdoct_tpu.sinks import RunWriter
        from fdoct_tpu.sources.camera import CameraSource

        exe = _build("capture_daemon")
        cfg = PipelineConfig(width=64, height=32, averages=1,
                             numfftpoints=128, numdisplaypoints=64,
                             manualaverages=3, dirdescr="trigtest")
        ring = tmp_path / "ring"
        env_backup = os.environ.get("FDOCT_STUB_FAKE")
        os.environ["FDOCT_STUB_FAKE"] = "1"
        try:
            src = CameraSource(
                ring, daemon_args=["--synthetic", "--trigger", "sw"],
                width=64, height=32, bpp=8, fps=200.0, sequential=True,
                initial_ctrl={"exposure": 1000.0, "gain": 0.0})
            sink = RunWriter(tmp_path, cfg.dirdescr)
            s = Session(cfg, variant="spinj", sink=sink, source=src)
            s.key("t")                       # fires 3 pulses via src.trigger
            it = src.frames()
            for _ in range(3):
                s.process(next(it))
            pngs = sorted(p.name for p in sink.dir.glob("Trig*.png"))
            assert pngs == ["Trig000-000.png", "Trig000-001.png",
                            "Trig000-002.png"], pngs
            src.close()
        finally:
            if env_backup is None:
                os.environ.pop("FDOCT_STUB_FAKE", None)
            else:
                os.environ["FDOCT_STUB_FAKE"] = env_backup


    def test_idle_triggered_source_yields_none_not_starved(self, tmp_path):
        """triggered=True relaxes the starvation watchdog: between pulses
        the daemon (by design) emits nothing, so frames() must yield None
        and keep the daemon alive — NOT restart it and raise TimeoutError
        after starve_timeout_s, which previously killed an idle
        `fdoct live --trigger sw` session within seconds."""
        from fdoct_tpu.sources.camera import CameraSource

        exe = _build("capture_daemon")
        assert exe.exists()
        ring = tmp_path / "ring"
        src = CameraSource(ring, daemon_args=["--synthetic", "--trigger", "sw"],
                           width=64, height=32, bpp=8, fps=200.0,
                           sequential=True, triggered=True,
                           starve_timeout_s=0.2,
                           initial_ctrl={"exposure": 1000.0, "gain": 0.0})
        try:
            it = src.frames()
            t0 = time.monotonic()
            nones = 0
            while time.monotonic() - t0 < 0.8:   # 4x the starve timeout
                assert next(it) is None           # idle, not an error
                nones += 1
            assert nones > 0
            assert src.restarts == 0              # watchdog did not fire
            src.trigger(1)
            f, t0 = None, time.monotonic()
            while f is None and time.monotonic() - t0 < 5.0:
                f = next(it)
            assert f is not None and f.shape == (32, 64)
        finally:
            src.close()


@pytest.mark.parametrize("target", ["capture_daemon_qhy_asan",
                                    "capture_daemon_spin_asan"])
def test_seam_asan_clean(tmp_path, target):
    """The full fake-seam loop must be ASan-clean, including shutdown."""
    exe = _build(target)
    mode = "--qhy" if "qhy" in target else "--spinnaker"
    ring = tmp_path / "ring"
    proc = _spawn(exe, ring, [mode])
    try:
        # try/finally: a RingReader timeout here used to leak the daemon
        # process past the test run (observed as orphaned *_asan daemons
        # after a failure)
        r = RingReader(ring)
        assert r.latest(timeout_s=10.0) is not None
        r.set_ctrl("exposure", 800.0)
        assert r.wait_ctrl_applied(3.0)
        r.close()
    finally:
        rc, err = _stop(proc)
    assert rc == 0, err
    assert "AddressSanitizer" not in err
