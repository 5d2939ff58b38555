"""Volumetric C-scan with dispersion sweep — the BASELINE.md config-5 shape.

A stack of B-scan frames (the slow axis of a volume) is sharded over the
device mesh ('data' = frames, 'ascan' = lateral rows), a dispersion sweep
picks the compensation coefficient on a subsample, the fused operator is
rebuilt with the winner, and the volume is reconstructed with all_gather
assembling complete B-scans per frame.  On a multi-host pod each host runs
this same script (parallel.initialize_multihost handles the rendezvous) and
holds its frame shard.

Run: python examples/cscan_volume.py [n_frames]
"""

import sys
from pathlib import Path as _P
sys.path.insert(0, str(_P(__file__).resolve().parent.parent))  # run from a checkout

import numpy as np
import jax
import jax.numpy as jnp

from fdoct_tpu.autofocus import autofocused_calibration, sweep_volume
from fdoct_tpu.calibration import Calibration
from fdoct_tpu.config import PipelineConfig
from fdoct_tpu.parallel import (
    initialize_multihost, make_mesh, shard_frames, sharded_cscan_volume)
from fdoct_tpu.sources.synthetic import SyntheticSource


def main(n_frames: int = 32) -> None:
    initialize_multihost()      # no-op single-process

    cfg = PipelineConfig(width=512, height=64, binvalue=1,
                         numfftpoints=1024, numdisplaypoints=256,
                         lambdamin=816e-9, lambdamax=884e-9, dtype="float32")
    calib = Calibration.create(cfg)

    # synthetic volume: scatterer depth drifts across the slow axis
    frames = []
    for i in range(n_frames):
        src = SyntheticSource(height=cfg.height, width=cfg.width,
                              depths_um=(40.0 + i * 0.5, 90.0),
                              reflectivities=(0.5, 0.3), seed=i)
        frames.append(next(iter(src.frames())))
    volume_raw = np.stack(frames)
    bg = jnp.asarray(np.maximum(src.background(), 1).astype(np.float32))
    pi = jnp.zeros_like(bg)

    n_dev = len(jax.devices())
    n_ascan = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
    mesh = make_mesh(n_dev // n_ascan, n_ascan)
    print(f"mesh: {dict(mesh.shape)} over {n_dev} devices")

    # dispersion sweep on a subsample, then rebuild the operator
    grid = jnp.linspace(-4.0, 4.0, 17)
    scores, best_a2 = sweep_volume(jnp.asarray(volume_raw[:1]), bg, pi,
                                   calib, cfg, grid)
    print(f"dispersion sweep: best a2 = {best_a2:+.2f}")
    calib = autofocused_calibration(cfg, best_a2) if best_a2 else calib

    sharded = shard_frames(jnp.asarray(volume_raw), mesh)
    vol = sharded_cscan_volume(sharded, bg, pi, calib, cfg, mesh)
    vol.block_until_ready()
    print(f"C-scan volume: {vol.shape} (frames sharded over 'data': "
          f"{vol.sharding.spec})")

    # depth of the drifting scatterer per frame: the staircase signature
    v = np.asarray(jax.device_get(vol))
    peaks = [int(np.argmax(v[i, 6:, 32])) + 6 for i in range(0, n_frames, 8)]
    print(f"peak depth bins along slow axis: {peaks}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
