"""Worker for the two-process multi-host test (launched by test_multihost).

Each process owns half the frame batch (data-parallel across "hosts"),
runs the sharded B-scan step over the global 2-device mesh, and process 0
checks the result against a locally-computed single-device reference.
Exit code 0 = parity held.
"""

import sys

import numpy as np


def main() -> int:
    pid = int(sys.argv[1])
    port = sys.argv[2]

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fdoct_tpu.calibration import Calibration
    from fdoct_tpu.config import PipelineConfig
    from fdoct_tpu.parallel import make_mesh, sharded_bscan_step
    from fdoct_tpu.pipeline import form_bscan, reconstruct

    cfg = PipelineConfig(width=64, height=8, binvalue=1, averages=4,
                         numfftpoints=128, numdisplaypoints=40,
                         dtype="float64", compat=True)
    calib = Calibration.create(cfg)

    rng = np.random.default_rng(123)            # same seed on both hosts
    frames_global = rng.integers(0, 255, (4, 8, 64)).astype(np.uint8)
    bg = np.full((8, 64), 100.0)
    pi = np.zeros((8, 64))

    mesh = make_mesh(2, 1)                      # 2 "hosts" x 1
    sharding = NamedSharding(mesh, P("data", "ascan", None))
    local = frames_global[pid * 2:(pid + 1) * 2]  # this host's shard
    frames = jax.make_array_from_process_local_data(sharding, local)

    db, disp = sharded_bscan_step(frames, jnp.asarray(bg), jnp.asarray(pi),
                                  calib, cfg, mesh)
    # with mesh (data=2, ascan=1) the outputs are fully replicated: each
    # process's local shard is the complete B-scan
    db_local = np.asarray(db.addressable_data(0))

    if pid == 0:
        mags = reconstruct(jnp.asarray(frames_global), jnp.asarray(bg),
                           jnp.asarray(pi), calib, cfg, method="fused")
        ref = np.asarray(form_bscan(mags.sum(0), cfg, averages=4).bscandb)
        got = db_local
        if not np.allclose(got, ref, atol=1e-9):
            print("MISMATCH", np.abs(got - ref).max(), file=sys.stderr)
            return 1

    # int8-direct sharded step across the same process boundary: the plan
    # tables must replicate/shard correctly through
    # make_array_from_process_local_data's global mesh (round 3)
    from fdoct_tpu.int8direct import (Int8DirectPlan, reconstruct_int8_direct,
                                      to_s8)
    from fdoct_tpu.parallel import sharded_bscan_step_int8

    cfg8 = cfg.replace(dtype="float32", matmul_precision="int8_direct")
    calib8 = Calibration.create(cfg8, dtype="float32")
    plan = Int8DirectPlan.create(calib8, cfg8, bg, pi)
    db8, _ = sharded_bscan_step_int8(frames, plan, cfg8, mesh)
    db8_local = np.asarray(db8.addressable_data(0))

    if pid == 0:
        m8 = reconstruct_int8_direct(jnp.asarray(to_s8(frames_global)), plan)
        ref8 = np.asarray(form_bscan(m8.sum(0), cfg8, averages=4).bscandb)
        if not np.allclose(db8_local, ref8, atol=1e-4):
            print("INT8 MISMATCH", np.abs(db8_local - ref8).max(),
                  file=sys.stderr)
            return 1
        print("MULTIHOST_OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
