"""Config (ini round-trip + reference ini parsing) and sink tests."""

import numpy as np
import pytest

from fdoct_tpu.config import SCHEMAS, PipelineConfig, read_ini, write_ini
from fdoct_tpu.sinks import RunWriter, matlab_matrix
from fdoct_tpu.utils.colormap import apply_jet, jet_table
from fdoct_tpu.utils.cvxml import read_xml, write_xml
from fdoct_tpu.utils.imageio import read_png, read_png_gray, write_png
from fdoct_tpu.utils.ocv_io import matread, matwrite

REF_INI = "/root/reference/build/BscanFFT.ini"


class TestIni:
    @pytest.mark.parametrize("variant", list(SCHEMAS))
    def test_roundtrip(self, variant, tmp_path):
        cfg = PipelineConfig(width=320, height=240, binvalue=2, averages=10,
                             numfftpoints=2560, lambdamin=840.5e-9,
                             lambdamax=859.5e-9, dirdescr="roundtrip",
                             offline_tool_path="/usr/bin/offline_tool")
        p = tmp_path / f"{variant}.ini"
        write_ini(cfg, p, variant)
        back = read_ini(p, variant)
        for name, _ in SCHEMAS[variant]:
            assert getattr(back, name) == getattr(cfg, name), name

    @pytest.mark.skipif(not __import__("os").path.exists(REF_INI),
                        reason="reference tree not mounted")
    def test_parses_reference_ini(self):
        cfg = read_ini(REF_INI, "base")
        # values from build/BscanFFT.ini
        assert cfg.gain == 12 and cfg.exposure_us == 1000
        assert cfg.width == 320 and cfg.height == 240
        assert cfg.binvalue == 2 and cfg.averages == 10
        assert cfg.numfftpoints == 2560
        assert cfg.increasefftpointsmultiplier == 4
        assert cfg.lambdamin == pytest.approx(840.5e-9)
        assert cfg.lambdamax == pytest.approx(859.5e-9)
        assert cfg.donotnormalize is True

    def test_short_file_raises(self, tmp_path):
        p = tmp_path / "bad.ini"
        p.write_text("#a\n#b\n#c\n12\n")
        with pytest.raises(ValueError, match="too short"):
            read_ini(p, "base")

    def test_json_roundtrip(self):
        cfg = PipelineConfig(width=512, dispersion_a2=1.5)
        assert PipelineConfig.from_json(cfg.to_json()) == cfg

    def test_derived_props(self):
        cfg = PipelineConfig(width=320, height=240, binvalue=2,
                             lambdamin=800e-9, lambdamax=900e-9)
        assert cfg.opw == 160 and cfg.oph == 120
        assert cfg.lambda0 == pytest.approx(850e-9)


class TestImageIO:
    def test_png_roundtrip_8bit(self, tmp_path, rng):
        img = rng.integers(0, 255, (16, 24)).astype(np.uint8)
        p = tmp_path / "x.png"
        write_png(p, img)
        assert np.array_equal(read_png(p), img)

    def test_png_roundtrip_16bit(self, tmp_path, rng):
        img = rng.integers(0, 65535, (8, 12)).astype(np.uint16)
        p = tmp_path / "x16.png"
        write_png(p, img)
        back = read_png(p)
        assert back.dtype == np.uint16 and np.array_equal(back, img)

    def test_png_rgb_and_gray_channel(self, tmp_path, rng):
        img = rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
        p = tmp_path / "c.png"
        write_png(p, img)
        # channel 0 in OpenCV order (BGR) = RGB channel 2
        assert np.array_equal(read_png_gray(p, 0), img[..., 2])


class TestOcvIO:
    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int32,
                                       np.float32, np.float64])
    def test_roundtrip(self, tmp_path, rng, dtype):
        arr = rng.normal(0, 100, (6, 9)).astype(dtype)
        p = tmp_path / "m.ocv"
        matwrite(p, arr)
        back = matread(p)
        assert back.dtype == arr.dtype and np.array_equal(back, arr)

    def test_header_layout(self, tmp_path):
        arr = np.arange(6, dtype=np.float64).reshape(2, 3)
        p = tmp_path / "h.ocv"
        matwrite(p, arr)
        raw = p.read_bytes()
        import struct
        rows, cols, cvtype, ch = struct.unpack("<iiii", raw[:16])
        assert (rows, cols, cvtype, ch) == (2, 3, 6, 1)  # CV_64F == 6


class TestCvXml:
    def test_roundtrip(self, tmp_path, rng):
        mats = {"bscan001": rng.normal(size=(4, 5)),
                "nearestkindex": rng.integers(0, 100, (1, 7)).astype(np.int32)}
        p = tmp_path / "s.xml"
        write_xml(p, mats, scalars={"camgain": 12})
        back, scalars = read_xml(p)
        for k in mats:
            assert np.allclose(back[k], mats[k])
        assert scalars["camgain"] == 12


class TestRunWriter:
    def test_directory_name_format(self, tmp_path):
        w = RunWriter(tmp_path, "mydesc", timestamp=0.0)
        import re
        assert re.match(r"\d{4}-\d{2}-\d{2}_\d{2}_\d{2}_\d{2}-mydesc",
                        w.dir.name)

    def test_matlab_matrix_format(self):
        s = matlab_matrix(np.array([[1.0, 2.5], [3.0, 4.0]]))
        assert s == "[1, 2.5;\n 3, 4]"

    def test_m_file_is_octave_readable_syntax(self, tmp_path, rng):
        w = RunWriter(tmp_path, "m", fmt="m")
        w.save_data("bscan001", rng.normal(size=(3, 3)))
        w.parameter_footer(PipelineConfig())
        p = w.close()
        text = p.read_text()
        assert text.startswith("bscan001=[")
        assert text.rstrip().count("% ") >= 1

    def test_xml_fmt(self, tmp_path, rng):
        w = RunWriter(tmp_path, "x", fmt="xml")
        arr = rng.normal(size=(2, 2))
        w.save_data("bscan001", arr)
        p = w.close()
        mats, _ = read_xml(p)
        assert np.allclose(mats["bscan001"], arr)


class TestColormap:
    def test_jet_table_endpoints(self):
        t = jet_table()
        assert t.shape == (256, 3)
        # low end blue-ish, high end red-ish, middle green-ish
        assert t[0, 2] > 100 and t[0, 0] == 0
        assert t[255, 0] > 100 and t[255, 2] == 0
        assert t[128, 1] > 200

    def test_apply_jet(self, rng):
        img = rng.integers(0, 255, (4, 4)).astype(np.uint8)
        rgb = apply_jet(img)
        assert rgb.shape == (4, 4, 3) and rgb.dtype == np.uint8


class TestValidation:
    def test_valid_config_passes(self):
        PipelineConfig(width=128, height=64, binvalue=2).validate()

    def test_bad_binning(self):
        with pytest.raises(ValueError, match="not divisible"):
            PipelineConfig(width=130, height=64, binvalue=4).validate()

    def test_bad_lambda_range(self):
        with pytest.raises(ValueError, match="range"):
            PipelineConfig(lambdamin=900e-9, lambdamax=800e-9).validate()

    def test_display_exceeds_fft(self):
        with pytest.raises(ValueError, match="numdisplaypoints"):
            PipelineConfig(numfftpoints=128, numdisplaypoints=256).validate()
