"""Viewer rendering tests (files mode, headless)."""

import numpy as np
import pytest

from fdoct_tpu.config import PipelineConfig
from fdoct_tpu.session import Session
from fdoct_tpu.sources.synthetic import SyntheticSource
from fdoct_tpu.viewer import (
    Viewer, render_bscan, render_status, render_strip_chart)


class TestRenderers:
    def test_status_has_text(self):
        img = render_status(["fps = 30  Max intensity = 200", "Exp time = 1000"])
        assert img.shape == (300, 600)
        assert img.max() > 200 and (img > 0).sum() > 50  # antialiased text

    def test_bscan_marker(self):
        disp = np.zeros((64, 32), np.uint8)
        rgb = render_bscan(disp, ascanat=10)
        assert rgb.shape == (64, 32, 3)
        assert (rgb[-5, 10] == 255).all()      # marker drawn
        assert not (rgb[0, 10] == 255).all()

    def test_strip_chart(self):
        plot = np.zeros((300, 600))
        plot[150, 10] = 1
        img = render_strip_chart(plot)
        assert img[150, 10] == 255


class TestViewerFilesMode:
    def test_session_loop_writes_windows(self, tmp_path):
        cfg = PipelineConfig(width=64, height=8, averages=2,
                             numfftpoints=128, numdisplaypoints=40,
                             dtype="float64")
        src = SyntheticSource(height=8, width=64, depths_um=(20.0,))
        s = Session(cfg)
        v = Viewer(mode="files", outdir=tmp_path / "view")
        it = iter(src.frames())
        for _ in range(2):
            raw = next(it)
            r = s.process(raw)
            v.show_session_frame(s, raw, r)
        files = {p.name for p in (tmp_path / "view").iterdir()}
        assert {"show.png", "status.png", "bscan.png"} <= files

    def test_callback_mode(self):
        seen = []
        v = Viewer(mode="callback", callback=lambda n, i: seen.append(n))
        v.update("show", np.zeros((4, 4), np.uint8))
        assert seen == ["show"]

    def test_unknown_window_rejected(self):
        v = Viewer(mode="callback", callback=lambda n, i: None)
        with pytest.raises(ValueError):
            v.update("nope", np.zeros((2, 2)))
