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
