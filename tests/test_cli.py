"""CLI integration tests (in-process main() invocation)."""

from pathlib import Path

import numpy as np
import pytest

from fdoct_tpu.cli import main
from fdoct_tpu.config import PipelineConfig, write_ini
from fdoct_tpu.sources.synthetic import staircase_phantom
from fdoct_tpu.utils.imageio import write_png


@pytest.fixture(scope="module")
def phantom_dir(tmp_path_factory):
    """Small staircase phantom PNG set (the imgi/piimgi/backg trio)."""
    d = tmp_path_factory.mktemp("phantom")
    ph = staircase_phantom(h=40, w=256)
    for name, img in ph.items():
        write_png(d / f"{name}.png", img)
    return d


@pytest.fixture()
def small_ini(tmp_path):
    cfg = PipelineConfig(width=256, height=40, binvalue=1, averages=1,
                         numfftpoints=512, numdisplaypoints=128,
                         lambdamin=816e-9, lambdamax=884e-9,
                         dirdescr="cli", dtype="float32")
    p = tmp_path / "cli.ini"
    write_ini(cfg, p, "base")
    return str(p)


class TestSim:
    def test_sim_replay_writes_outputs(self, phantom_dir, small_ini, tmp_path):
        rc = main(["sim", "--config", small_ini,
                   "--image", str(phantom_dir / "imgi.png"),
                   "--outdir", str(tmp_path), "--frames", "2"])
        assert rc == 0
        runs = [p for p in tmp_path.iterdir() if p.is_dir()]
        assert len(runs) == 1
        files = {p.name for p in runs[0].iterdir()}
        assert "bscan001.png" in files and "bscanc002.png" in files
        assert "BscanFFT.m" in files

    def test_sim_bscan_shows_staircase(self, phantom_dir, small_ini, tmp_path):
        from fdoct_tpu.utils.imageio import read_png
        main(["sim", "--config", small_ini,
              "--image", str(phantom_dir / "imgi.png"),
              "--outdir", str(tmp_path), "--frames", "1"])
        run = next(p for p in tmp_path.iterdir() if p.is_dir())
        b = read_png(run / "bscan001.png").astype(float)
        # staircase phantom: deeper scatterers for later lateral blocks →
        # the bright-pixel depth centroid must increase across the image
        assert b.max() > 128, "display must have dynamic range (not black)"
        depth_idx = np.arange(b.shape[0])[:, None]
        w = np.maximum(b - np.percentile(b, 90), 0)
        centroid = (depth_idx * w).sum(0) / np.maximum(w.sum(0), 1e-9)
        assert centroid[35] > centroid[5]

    def test_precision_flag_overrides_config(self, phantom_dir, small_ini,
                                             tmp_path, monkeypatch):
        """--precision int8_direct routes the session onto the folded s8
        path (the ini schemas are positional and cannot carry the field).
        Pinned by capturing the Session the command builds."""
        seen = {}
        from fdoct_tpu import session as session_mod
        real_session = session_mod.Session

        def spy(cfg, *a, **kw):
            seen["precision"] = cfg.matmul_precision
            return real_session(cfg, *a, **kw)

        monkeypatch.setattr(session_mod, "Session", spy)
        rc = main(["sim", "--config", small_ini,
                   "--image", str(phantom_dir / "imgi.png"),
                   "--outdir", str(tmp_path), "--frames", "1",
                   "--precision", "int8_direct"])
        assert rc == 0
        assert seen["precision"] == "int8_direct"
        with pytest.raises(SystemExit):
            main(["sim", "--config", small_ini, "--precision", "int4"])

    def test_sim_on_reference_16bit_fixture(self, tmp_path):
        import os
        fix = Path("/root/reference/Matlab files")
        if not fix.exists():
            pytest.skip("reference not mounted")
        rc = main(["sim", "--image", str(fix / "imgi.png"),
                   "--background", str(fix / "backg.png"),
                   "--outdir", str(tmp_path), "--frames", "1"])
        assert rc == 0
        run = next(p for p in tmp_path.iterdir() if p.is_dir())
        from fdoct_tpu.utils.imageio import read_png
        b = read_png(run / "bscan001.png")
        assert b.shape[1] == 96            # lateral = fixture rows
        assert b.max() > 128               # not black: sim skips the floor


class TestCaptureOffline:
    def test_capture_then_offline(self, small_ini, tmp_path):
        rc = main(["capture", "--config", small_ini,
                   "--outdir", str(tmp_path), "--sets", "2",
                   "--frames-per-set", "3"])
        assert rc == 0
        run = next(p for p in tmp_path.iterdir() if p.is_dir())
        trigs = sorted(p.name for p in run.glob("Trig*.png"))
        assert trigs == [f"Trig{s:03d}-{f:03d}.png"
                        for s in range(2) for f in range(3)]
        rc = main(["offline", str(run), "3", "--config", small_ini])
        assert rc == 0
        assert (run / "offline_bscan000.png").exists()
        assert (run / "offline_bscanc001.png").exists()

    def test_capture_skips_triggered_idle_yields(self, small_ini, tmp_path,
                                                 monkeypatch):
        """A triggered CameraSource yields None between pulses
        (camera.py frames()); batch consumers must block across the idle
        gaps instead of crashing on None.dtype (cli._frame_iter)."""
        import fdoct_tpu.cli as cli_mod

        class TriggeredStub:
            def frames(self):
                while True:
                    yield None          # pulse gap (>50 ms poll timeout)
                    yield np.full((40, 256), 7, np.uint8)

        monkeypatch.setattr(cli_mod, "_make_source",
                            lambda args, cfg: TriggeredStub())
        rc = main(["capture", "--config", small_ini,
                   "--outdir", str(tmp_path), "--sets", "1",
                   "--frames-per-set", "2"])
        assert rc == 0
        run = next(p for p in tmp_path.iterdir() if p.is_dir())
        assert sorted(p.name for p in run.glob("Trig*.png")) == [
            "Trig000-000.png", "Trig000-001.png"]

    def test_capture_alternate_writes_ktrig(self, small_ini, tmp_path):
        main(["capture", "--config", small_ini, "--outdir", str(tmp_path),
              "--sets", "1", "--frames-per-set", "2", "--alternate"])
        run = next(p for p in tmp_path.iterdir() if p.is_dir())
        assert (run / "KTrig000-000.png").exists()


class TestViewport:
    def test_viewport_saves_frames(self, small_ini, tmp_path):
        rc = main(["viewport", "--config", small_ini,
                   "--outdir", str(tmp_path), "--frames", "3"])
        assert rc == 0
        run = next(p for p in tmp_path.iterdir() if p.is_dir())
        assert len(list(run.glob("frame*.png"))) == 3


class TestConverters:
    def test_xml2m_roundtrip(self, tmp_path, rng):
        from fdoct_tpu.utils.cvxml import write_xml
        xml = tmp_path / "dump.xml"
        write_xml(xml, {"bscan001": rng.normal(size=(3, 4)),
                        "linearized": rng.normal(size=(2, 5))},
                  scalars={"camgain": 7})
        rc = main(["xml2m", str(xml)])
        assert rc == 0
        out = tmp_path / "dump_xml2m.m"
        text = out.read_text()
        assert "bscan001=[" in text and "camgain=7" in text

    def test_xml2ms_per_matrix(self, tmp_path, rng):
        from fdoct_tpu.utils.cvxml import write_xml
        xml = tmp_path / "d2.xml"
        write_xml(xml, {"bscan001": rng.normal(size=(2, 2))})
        rc = main(["xml2ms", str(xml)])
        assert rc == 0
        assert (tmp_path / "d2_bscan001.m").read_text().startswith("bscan001=[")


class TestLive:
    def test_live_synthetic(self, small_ini, tmp_path, monkeypatch):
        import io
        monkeypatch.setattr("sys.stdin", io.StringIO(""))
        # select on StringIO fails; patch select to report no input
        monkeypatch.setattr("select.select", lambda *a, **k: ([], [], []))
        rc = main(["live", "--config", small_ini, "--outdir", str(tmp_path),
                   "--frames", "3"])
        assert rc == 0

    def test_live_mesh_rides_sharded_steps(self, tmp_path, monkeypatch):
        """fdoct live --mesh DxA: the live loop's batches go through
        Session._process_group_mesh (the sharded session steps) — the live
        data path on the mesh, VERDICT r3 item 1."""
        import io

        import fdoct_tpu.session as session_mod

        cfg = PipelineConfig(width=256, height=40, binvalue=1, averages=4,
                             numfftpoints=512, numdisplaypoints=128,
                             lambdamin=816e-9, lambdamax=884e-9,
                             dirdescr="mesh", dtype="float32")
        ini = tmp_path / "mesh.ini"
        write_ini(cfg, ini, "base")
        monkeypatch.setattr("sys.stdin", io.StringIO(""))
        monkeypatch.setattr("select.select", lambda *a, **k: ([], [], []))
        calls = []
        orig = session_mod.Session._process_group_mesh

        def spy(self, *a, **k):
            calls.append(1)
            return orig(self, *a, **k)

        monkeypatch.setattr(session_mod.Session, "_process_group_mesh", spy)
        rc = main(["live", "--config", str(ini), "--outdir", str(tmp_path),
                   "--frames", "8", "--mesh", "4x2"])
        assert rc == 0
        assert calls, "live --mesh never reached the sharded session step"

    def test_live_mesh_bad_format_is_clean_error(self, small_ini, tmp_path,
                                                 monkeypatch):
        import io
        monkeypatch.setattr("sys.stdin", io.StringIO(""))
        monkeypatch.setattr("select.select", lambda *a, **k: ([], [], []))
        for bad in ("x2", "a4x2", "4x0"):
            with pytest.raises(SystemExit) as ei:
                main(["live", "--config", small_ini,
                      "--outdir", str(tmp_path), "--frames", "1",
                      "--mesh", bad])
            assert "invalid --mesh" in str(ei.value)


class TestSpinjVariant:
    def test_variant_spinj_maps_to_spinj_session(self, small_ini, tmp_path,
                                                 monkeypatch):
        """--variant spinj must run the spinj session behavior (t/k/| trig
        keys) and parse the base ini ordering (BscanFFTspinj.ini shares it,
        BscanFFTspinj.cpp:831-920).  Regression: it silently fell back to
        the 'base' session, so the trigger keys were dead in live mode."""
        import io
        monkeypatch.setattr("sys.stdin", io.StringIO(""))
        monkeypatch.setattr("select.select", lambda *a, **k: ([], [], []))
        from fdoct_tpu.config import read_ini
        cfg = read_ini(small_ini, "spinj")     # base-ordered ini parses
        assert cfg.width == 256
        seen = {}
        from fdoct_tpu import session as session_mod
        real_session = session_mod.Session

        def spy(cfg, *a, **kw):
            seen["variant"] = kw.get("variant")
            return real_session(cfg, *a, **kw)

        monkeypatch.setattr(session_mod, "Session", spy)
        rc = main(["live", "--config", small_ini, "--variant", "spinj",
                   "--outdir", str(tmp_path), "--frames", "2"])
        assert rc == 0
        assert seen["variant"] == "spinj"


class TestLiveCamera:
    @pytest.mark.skipif(__import__("shutil").which("g++") is None,
                        reason="no C++ toolchain")
    def test_live_from_camera_ring(self, small_ini, tmp_path, monkeypatch):
        """live --camera: frames arrive via the native shared-memory ring
        fed by the spawned capture daemon (the hardware seat)."""
        import io
        monkeypatch.setattr("sys.stdin", io.StringIO(""))
        monkeypatch.setattr("select.select", lambda *a, **k: ([], [], []))
        rc = main(["live", "--config", small_ini, "--outdir", str(tmp_path),
                   "--camera", str(tmp_path / "cam.ring"),
                   "--camera-fps", "300", "--frames", "3"])
        assert rc == 0
        assert any(p.is_dir() for p in tmp_path.iterdir())  # run dir created
        from fdoct_tpu.cli import _open_sources
        assert not _open_sources  # daemon stopped, no orphan

    def test_bad_camera_daemon_spec(self, small_ini, tmp_path):
        with pytest.raises(SystemExit):
            main(["live", "--config", small_ini, "--outdir", str(tmp_path),
                  "--camera", str(tmp_path / "x.ring"),
                  "--camera-daemon", "bogus", "--frames", "1"])


class TestLiveCheckpoint:
    def test_checkpoint_then_resume(self, small_ini, tmp_path, monkeypatch):
        import io
        monkeypatch.setattr("select.select", lambda *a, **k: ([], [], []))
        ckpt = tmp_path / "sess.npz"
        monkeypatch.setattr("sys.stdin", io.StringIO(""))
        rc = main(["live", "--config", small_ini, "--outdir", str(tmp_path),
                   "--frames", "2", "--checkpoint", str(ckpt)])
        assert rc == 0 and ckpt.exists()
        monkeypatch.setattr("sys.stdin", io.StringIO(""))
        rc = main(["live", "--config", small_ini, "--outdir", str(tmp_path),
                   "--frames", "2", "--resume", str(ckpt)])
        assert rc == 0

    def test_checkpoint_suffixless_path_resumable(self, small_ini, tmp_path,
                                                  monkeypatch):
        """--checkpoint sess (no .npz) must report the REAL written file
        and --resume sess must find it (np.savez appends the suffix;
        utils.checkpoint owns that rule now)."""
        import io
        monkeypatch.setattr("select.select", lambda *a, **k: ([], [], []))
        ckpt = tmp_path / "sess"                      # suffixless
        monkeypatch.setattr("sys.stdin", io.StringIO(""))
        rc = main(["live", "--config", small_ini, "--outdir", str(tmp_path),
                   "--frames", "2", "--checkpoint", str(ckpt)])
        assert rc == 0
        assert (tmp_path / "sess.npz").exists()
        monkeypatch.setattr("sys.stdin", io.StringIO(""))
        rc = main(["live", "--config", small_ini, "--outdir", str(tmp_path),
                   "--frames", "2", "--resume", str(ckpt)])
        assert rc == 0

    def test_periodic_checkpoint_every_n_groups(self, small_ini, tmp_path,
                                                monkeypatch):
        """--checkpoint-every N writes the (atomic) checkpoint mid-run so a
        hard crash loses at most N groups of session state."""
        import io

        import fdoct_tpu.utils.checkpoint as ckpt_mod
        monkeypatch.setattr("select.select", lambda *a, **k: ([], [], []))
        monkeypatch.setattr("sys.stdin", io.StringIO(""))
        saves = []
        orig = ckpt_mod.save_session
        monkeypatch.setattr(ckpt_mod, "save_session",
                            lambda s, p, **k: (saves.append(str(p)),
                                               orig(s, p, **k))[1])
        ckpt = tmp_path / "sess.npz"
        rc = main(["live", "--config", small_ini, "--outdir", str(tmp_path),
                   "--frames", "6", "--checkpoint", str(ckpt),
                   "--checkpoint-every", "2"])
        assert rc == 0 and ckpt.exists()
        # 6 frames at averages=1 = 6 groups -> 3 periodic + 1 exit save,
        # ALL through the atomic write-aside path (an in-place exit save
        # could truncate the last good periodic checkpoint)
        assert len(saves) == 4, saves
        assert all(p.endswith(".tmp.npz") for p in saves), saves
        # the periodic writes landed on the real checkpoint (resumable)
        from fdoct_tpu.utils.checkpoint import load_session
        assert load_session(ckpt) is not None

    def test_sigterm_exits_through_checkpoint(self, small_ini, tmp_path):
        """A service stop (SIGTERM) must exit the live loop cleanly through
        the exit-time checkpoint + footer close, not die mid-frame."""
        import signal
        import subprocess
        import sys as _sys
        import time

        ckpt = tmp_path / "sess.npz"
        log = tmp_path / "live.log"
        code = (
            "import sys; sys.path.insert(0, {root!r});\n"
            "import os; os.environ['JAX_PLATFORMS'] = 'cpu'\n"
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "from fdoct_tpu.cli import main\n"
            "sys.exit(main(['live', '--config', {ini!r}, '--outdir', "
            "{out!r}, '--frames', '0', '--verbose', "
            "'--checkpoint', {ckpt!r}]))\n"
        ).format(root=str(Path(__file__).resolve().parents[1]),
                 ini=small_ini, out=str(tmp_path), ckpt=str(ckpt))
        with open(log, "w") as lf:
            proc = subprocess.Popen([_sys.executable, "-c", code],
                                    stdin=subprocess.DEVNULL,
                                    stdout=lf, stderr=subprocess.STDOUT,
                                    text=True)
        try:
            # poll for real processing (a fixed sleep both flaked on slow
            # hosts — the handler installs just before the loop — and put
            # a hard floor on every run)
            deadline = time.monotonic() + 90
            while time.monotonic() < deadline:
                if "bscan group done" in log.read_text():
                    break
                time.sleep(0.3)
            else:
                raise AssertionError(f"never started: {log.read_text()[-800:]}")
            proc.send_signal(signal.SIGTERM)
            proc.wait(timeout=60)
        except subprocess.TimeoutExpired:
            proc.kill()
            raise
        out = log.read_text()
        assert proc.returncode == 0, out[-800:]
        assert "finishing up" in out, out[-800:]
        assert "processed" in out, out[-800:]
        assert ckpt.exists()


class TestCscan:
    def test_cscan_writes_volume(self, small_ini, tmp_path):
        rc = main(["cscan", "--config", small_ini, "--outdir", str(tmp_path),
                   "--frames", "8"])
        assert rc == 0
        run = next(p for p in tmp_path.iterdir() if p.is_dir())
        data = np.load(run / "BscanFFT.npz")
        assert data["cscan"].shape[0] == 8
        assert any(p.name.startswith("cscan_frame") for p in run.iterdir())

    def test_cscan_with_sweep(self, small_ini, tmp_path):
        rc = main(["cscan", "--config", small_ini, "--outdir", str(tmp_path),
                   "--frames", "4", "--dispersion-sweep"])
        assert rc == 0


class TestSelftest:
    def test_selftest_passes(self):
        assert main(["selftest"]) == 0


class TestLiveBatch:
    def test_live_batch_exact_frames(self, small_ini, tmp_path, monkeypatch):
        """--batch rides Session.process_group and honors --frames exactly
        (a short final batch, not an overshoot)."""
        import io
        monkeypatch.setattr("sys.stdin", io.StringIO(""))
        monkeypatch.setattr("select.select", lambda *a, **k: ([], [], []))
        rc = main(["live", "--config", small_ini, "--outdir", str(tmp_path),
                   "--batch", "4", "--frames", "10"])
        assert rc == 0

    def test_live_triggered_ignores_batch(self, small_ini, tmp_path,
                                          monkeypatch, capsys):
        """An explicit --batch on a TRIGGERED camera must fall back to the
        per-frame loop: the batched streamer services keys only between
        batches, so the pulse that produces the first frame could never
        fire and the session would die on the ingest timeout."""
        import io

        import fdoct_tpu.cli as cli_mod
        monkeypatch.setattr("sys.stdin", io.StringIO(""))
        monkeypatch.setattr("select.select", lambda *a, **k: ([], [], []))

        class TriggeredStub:
            triggered = True

            def frames(self):
                while True:
                    yield None          # pulse gap
                    yield np.full((40, 256), 9, np.uint8)

        monkeypatch.setattr(cli_mod, "_make_source",
                            lambda args, cfg: TriggeredStub())
        rc = main(["live", "--config", small_ini, "--outdir", str(tmp_path),
                   "--batch", "16", "--frames", "2"])
        assert rc == 0
        assert "per-frame loop" in capsys.readouterr().err

    @pytest.mark.skipif(__import__("shutil").which("g++") is None,
                        reason="no C++ toolchain")
    def test_live_batch_dead_daemon_is_an_error(self, small_ini, tmp_path,
                                                monkeypatch):
        """A camera daemon that dies past max_restarts surfaces as an
        error, not a silent 'processed N frames' exit 0."""
        import io

        import fdoct_tpu.sources.camera as cam_mod
        monkeypatch.setattr("sys.stdin", io.StringIO(""))
        monkeypatch.setattr("select.select", lambda *a, **k: ([], [], []))
        # make every spawned daemon die instantly and disable restarts
        orig_init = cam_mod.CameraSource.__init__

        def init(self, *a, **kw):
            kw["max_restarts"] = 0
            kw["starve_timeout_s"] = 1.0
            orig_init(self, *a, **kw)
            self.proc.kill()
            self.proc.wait(timeout=5)

        monkeypatch.setattr(cam_mod.CameraSource, "__init__", init)
        with pytest.raises(TimeoutError):
            main(["live", "--config", small_ini, "--outdir", str(tmp_path),
                  "--camera", str(tmp_path / "dead.ring"),
                  "--batch", "4", "--frames", "20"])


class TestExamples:
    """The checked-in examples must keep running from a checkout."""

    @pytest.mark.parametrize("script,args", [
        ("demo.py", []),
        ("cscan_volume.py", ["8"]),
        ("vibrometry_demo.py", []),
    ])
    def test_example_runs(self, script, args, tmp_path, monkeypatch):
        import subprocess
        import sys as _sys

        root = Path(__file__).resolve().parents[1]
        env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
               "HOME": str(tmp_path)}
        r = subprocess.run(
            [_sys.executable, str(root / "examples" / script)] + args,
            cwd=tmp_path, capture_output=True, text=True, timeout=300,
            env=env)
        assert r.returncode == 0, r.stdout[-500:] + r.stderr[-500:]


class TestResumeCameraControl:
    @pytest.mark.skipif(__import__("shutil").which("g++") is None,
                        reason="no C++ toolchain")
    def test_resume_pushes_restored_exposure(self, small_ini, tmp_path,
                                             monkeypatch):
        """--resume restores the session's exposure AND pushes it to the
        running camera via the control block (the restored-knobs-win rule
        in cmd_live)."""
        import io

        ring = tmp_path / "cam.ring"
        ck = tmp_path / "ck.npz"
        # first run: 'u' raises exposure 1000 -> 2000, checkpointed on exit
        monkeypatch.setattr("sys.stdin", io.StringIO("u\n"))
        calls = iter([([__import__("sys").stdin], [], []), ([], [], [])])
        monkeypatch.setattr("select.select",
                            lambda *a, **k: next(calls, ([], [], [])))
        rc = main(["live", "--config", small_ini, "--outdir", str(tmp_path),
                   "--camera", str(ring), "--camera-fps", "300",
                   "--frames", "3", "--checkpoint", str(ck)])
        assert rc == 0 and ck.exists()
        # second run resumes; the restored 2000 µs must land in the ring
        monkeypatch.setattr("sys.stdin", io.StringIO(""))
        monkeypatch.setattr("select.select", lambda *a, **k: ([], [], []))
        rc = main(["live", "--config", small_ini, "--outdir", str(tmp_path),
                   "--camera", str(ring), "--camera-fps", "300",
                   "--frames", "2", "--resume", str(ck)])
        assert rc == 0
        from fdoct_tpu.sources.camera import RingReader
        r = RingReader(ring)
        try:
            assert r.get_ctrl("exposure") == 2000.0
        finally:
            r.close()


class TestLiveConfigPanel:
    def test_config_edit_applies_during_live_loop(self, small_ini, tmp_path,
                                                  monkeypatch):
        """POST /config while `fdoct live` runs: the loop drains the edit
        and the threshold takes effect mid-session (the full editiniadv-
        analog path: browser → viewer server → Session.apply_config)."""
        import io
        import json
        import threading
        import urllib.request

        monkeypatch.setattr("sys.stdin", io.StringIO(""))
        monkeypatch.setattr("select.select", lambda *a, **k: ([], [], []))

        seen = {}

        # post the edit from a side thread once the server is up; the live
        # loop (100 frames) keeps running long enough to drain it
        def prodder():
            import time as _t
            from fdoct_tpu import viewer as _v
            for _ in range(200):
                srv = getattr(prodder, "srv", None)
                if srv is not None:
                    break
                _t.sleep(0.02)
            if srv is None:
                return
            url = f"http://127.0.0.1:{srv.port}/config"
            req = urllib.request.Request(
                url, data=json.dumps({"bscanthreshold": "-44"}).encode(),
                method="POST")
            urllib.request.urlopen(req, timeout=5)
            for _ in range(300):
                got = json.loads(urllib.request.urlopen(
                    url, timeout=5).read())
                if got["live"]["bscanthreshold"] == -44.0:
                    seen["applied"] = True
                    return
                _t.sleep(0.02)

        from fdoct_tpu.viewer_server import ViewerServer
        orig_init = ViewerServer.__init__

        def spy_init(self, *a, **k):
            orig_init(self, *a, **k)
            prodder.srv = self

        monkeypatch.setattr(ViewerServer, "__init__", spy_init)
        t = threading.Thread(target=prodder)
        t.start()
        rc = main(["live", "--config", small_ini, "--outdir", str(tmp_path),
                   "--frames", "100", "--viewer-mode", "http",
                   "--viewer-port", "0"])
        t.join(timeout=15)
        assert rc == 0
        assert seen.get("applied"), "config edit never took effect live"


class TestAdvisorGuards:
    """Round-5 advisor findings: loud failures instead of silent hangs."""

    def test_frame_iter_idle_timeout(self):
        """A triggered source that never receives pulses yields None
        forever; consumers that never fire pulses must get a clear error
        after the idle cap, not block forever (ADVICE r4)."""
        from fdoct_tpu.cli import _frame_iter

        class NeverFires:
            def frames(self):
                while True:
                    yield None

        it = _frame_iter(NeverFires(), idle_timeout_s=0.05)
        with pytest.raises(TimeoutError, match="no frame"):
            next(it)

    def test_frame_iter_tolerates_idle_gaps(self):
        """Idle gaps shorter than the cap still block-and-skip (the
        pulse-firing consumers' contract)."""
        from fdoct_tpu.cli import _frame_iter

        class Gappy:
            def frames(self):
                for i in range(3):
                    yield None
                    yield np.full((4, 4), i, np.uint8)

        it = _frame_iter(Gappy(), idle_timeout_s=5.0)
        assert [int(f[0, 0]) for f in it] == [0, 1, 2]

    def test_checkpoint_every_requires_checkpoint_path(self, small_ini,
                                                       tmp_path):
        with pytest.raises(SystemExit, match="requires --checkpoint"):
            main(["live", "--config", small_ini, "--outdir", str(tmp_path),
                  "--frames", "1", "--checkpoint-every", "5"])

    def test_parse_mesh_capacity_error_not_syntax(self):
        """A well-formed DxA spec that exceeds the device count must read
        as a capacity problem, not 'invalid --mesh (expected DxA)'."""
        from fdoct_tpu.cli import _parse_mesh
        with pytest.raises(SystemExit) as exc:
            _parse_mesh("5x3")        # well-formed; 15 != 8 cpu devices
        assert "expected DxA" not in str(exc.value)
        assert "devices" in str(exc.value)

    def test_parse_mesh_syntax_error(self):
        from fdoct_tpu.cli import _parse_mesh
        with pytest.raises(SystemExit, match="expected DxA"):
            _parse_mesh("fast")

    def test_idle_timeout_nonpositive_waits(self):
        """<= 0 disables the cap (operator-paced trigger workflows): the
        iterator must keep blocking across arbitrarily long idle gaps."""
        from fdoct_tpu.cli import _idle_timeout

        class A:
            idle_timeout = 0
        class B:
            idle_timeout = -1.0
        assert _idle_timeout(A()) == float("inf")
        assert _idle_timeout(B()) == float("inf")
        class C:
            idle_timeout = 5.5
        assert _idle_timeout(C()) == 5.5
