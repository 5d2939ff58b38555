"""Config validation + fuzz tests (VERDICT round-1 item 10).

The reference's positional ini parser silently misbehaves on inconsistent
values (non-divisible binning truncates, numdisplaypoints > nfft reads past
the magnitude rows).  Here `validate()` runs at every config boundary
(read_ini, from_json, Calibration.create); random configs must either pass
validation and build a working Calibration, or fail with a clear
ValueError — never crash deeper in the stack.
"""

import numpy as np
import pytest

from fdoct_tpu.calibration import Calibration
from fdoct_tpu.config import PipelineConfig, read_ini, write_ini


class TestBoundaryValidation:
    def test_read_ini_rejects_inconsistent_geometry(self, tmp_path):
        bad = PipelineConfig(width=130, height=64, binvalue=4)  # 130 % 4 != 0
        p = tmp_path / "bad.ini"
        write_ini(bad, p, "base")
        with pytest.raises(ValueError, match="not divisible"):
            read_ini(p, "base")

    def test_read_ini_rejects_display_overrun(self, tmp_path):
        bad = PipelineConfig(numfftpoints=256, numdisplaypoints=512)
        p = tmp_path / "bad2.ini"
        write_ini(bad, p, "base")
        with pytest.raises(ValueError, match="numdisplaypoints"):
            read_ini(p, "base")

    def test_read_ini_validate_false_allows_repair(self, tmp_path):
        bad = PipelineConfig(numfftpoints=256, numdisplaypoints=512)
        p = tmp_path / "bad3.ini"
        write_ini(bad, p, "base")
        cfg = read_ini(p, "base", validate=False)   # configedit path
        assert cfg.numdisplaypoints == 512

    def test_from_json_rejects_unknown_fields(self):
        with pytest.raises(ValueError, match="unknown config fields"):
            PipelineConfig.from_json('{"widht": 64}')

    def test_from_json_validates(self):
        with pytest.raises(ValueError, match="λ range"):
            PipelineConfig.from_json('{"lambdamin": 9e-7, "lambdamax": 8e-7}')


class TestFuzz:
    def test_random_configs_validate_or_fail_clearly(self):
        """Property: for random field combinations, either validate() passes
        and Calibration.create succeeds with the right shapes, or validate()
        raises ValueError before any deeper machinery runs."""
        rng = np.random.default_rng(7)
        built = rejected = 0
        for _ in range(60):
            cfg = PipelineConfig(
                width=int(rng.choice([0, 64, 128, 130, 256])),
                height=int(rng.choice([0, 16, 32, 33])),
                binvalue=int(rng.choice([1, 1, 2])),
                averages=int(rng.choice([0, 1, 3, 3])),
                numfftpoints=int(rng.choice([1, 64, 160, 320])),
                numdisplaypoints=int(rng.choice([16, 100, 512])),
                lambdamin=float(rng.choice([816e-9] * 6 + [-1e-9, 900e-9])),
                lambdamax=884e-9,
                increasefftpointsmultiplier=int(rng.choice([1, 1, 1, 0, 2])),
                dtype="float64",
            )
            try:
                cfg.validate()
            except ValueError as e:
                assert str(e)            # clear, non-empty message
                rejected += 1
                continue
            calib = Calibration.create(cfg)
            assert calib.op_re.shape == (cfg.opw, calib.ndisp)
            assert calib.ndisp == min(cfg.numdisplaypoints, cfg.numfftpoints)
            built += 1
        # the grid must actually exercise both outcomes
        assert built >= 5 and rejected >= 5, (built, rejected)

    def test_validate_zero_dims(self):
        with pytest.raises(ValueError):
            PipelineConfig(width=0, height=0).validate()

    def test_random_valid_configs_process_at_every_precision(self):
        """Property (round 3): any VALID config must run one frame through
        the live Session at every matmul precision without raising — the
        int8_direct mode in particular is an optimization with a fallback
        gate (int8_direct_supported), never a mode that can crash or be
        required.  The plan must exist exactly when the gate says the
        folding applies."""
        import jax.numpy as jnp

        from fdoct_tpu.int8direct import int8_direct_supported
        from fdoct_tpu.session import Session

        rng = np.random.default_rng(11)
        ran = {"planned": 0, "fallback": 0}
        for _ in range(12):
            cfg = PipelineConfig(
                width=128, height=16, binvalue=int(rng.choice([1, 2])),
                averages=1, numfftpoints=256,
                numdisplaypoints=int(rng.choice([32, 64])),
                mediann=int(rng.choice([0, 0, 3])),
                movavgn=int(rng.choice([0, 0, 3])),
                matmul_precision=str(rng.choice(
                    ["default", "highest", "bf16", "int8", "int8_direct"])),
                dtype="float32",
            )
            cfg.validate()
            s = Session(cfg, variant="base")
            # background at the PREPROCESSED geometry (binning shrinks it)
            h, w = 16 // max(cfg.binvalue, 1), 128 // max(cfg.binvalue, 1)
            s.data_yb = jnp.full((h, w), 128.0, jnp.float32)
            s.data_yp = jnp.zeros((h, w), jnp.float32)
            frame = rng.integers(0, 255, (16, 128)).astype(np.uint8)
            r = s.process(frame)
            # bscandisp is (depth, lateral); lateral = binned height rows
            assert r is not None and r.bscandisp.shape[1] == h
            if (cfg.matmul_precision == "int8_direct"
                    and int8_direct_supported(cfg)[0]
                    and max(cfg.binvalue, 1) == 1):
                assert s._i8plan is not None
                ran["planned"] += 1
            else:
                assert s._i8plan is None
                ran["fallback"] += 1
        assert ran["fallback"] >= 1   # grid exercised the fallback side

    def test_random_configs_fast_paths_match_per_frame(self):
        """Property (round 5, VERDICT r4 weak-2): the fuzz crosses the
        FAST PATHS with the risky flags.  For random valid configs —
        including donotnormalize=0, mediann>1, rowwisenormalize and the
        save flags the fast paths historically mishandled or dropped —
        process_group on a single device AND on a mesh must match
        frame-by-frame process."""
        import jax.numpy as jnp

        from fdoct_tpu.parallel import make_mesh
        from fdoct_tpu.session import Session

        rng = np.random.default_rng(13)
        mesh = make_mesh(4, 2)
        for it in range(6):
            cfg = PipelineConfig(
                width=128, height=16, binvalue=1, averages=8,
                numfftpoints=256, numdisplaypoints=48,
                mediann=int(rng.choice([0, 3, 5])),
                donotnormalize=bool(rng.choice([True, False])),
                rowwisenormalize=bool(rng.choice([True, False, False])),
                saveframes=bool(rng.choice([True, False])),
                saveinterferograms=bool(rng.choice([True, False])),
                matmul_precision=str(rng.choice(["default", "int8_direct"])),
                dtype="float32")
            cfg.validate()
            # per-frame value ranges differ so a joint/shard-local min/max
            # is distinguishable from the reference's per-frame normalize
            frames = np.stack([
                rng.integers(int(lo), int(lo) + int(spread),
                             (16, 128)).astype(np.uint8)
                for lo, spread in zip(rng.integers(0, 60, 16),
                                      rng.integers(120, 190, 16))])
            bg = np.full((16, 128), 128.0, np.float32)

            def mk(mesh_=None):
                s = Session(cfg, mesh=mesh_)
                s.data_yb = jnp.asarray(bg)
                return s

            s1, s2, s3 = mk(), mk(), mk(mesh)
            seq = [r for f in frames if (r := s1.process(f)) is not None]
            fast = s2.process_group(frames)
            shard = s3.process_group(frames)
            assert len(seq) == len(fast) == len(shard) == 2, (it, cfg)
            for a, b in zip(seq, fast):
                np.testing.assert_allclose(
                    np.asarray(a.bscandb), np.asarray(b.bscandb),
                    atol=1e-4, err_msg=f"iter {it} single-device: {cfg}")
            for a, c in zip(seq, shard):
                np.testing.assert_allclose(
                    np.asarray(a.bscandb), np.asarray(c.bscandb),
                    atol=1e-3, err_msg=f"iter {it} mesh: {cfg}")
