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
