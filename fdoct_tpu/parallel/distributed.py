"""Multi-host initialization.

The reference's only inter-process mechanism is fork/execv with the
filesystem as channel (BscanFFTspinj.cpp:2389-2412); the TPU-native
equivalent is jax.distributed over ICI/DCN: every host runs the same
program, sees its local devices, and the collectives in parallel.sharded
span the global mesh.
"""

from __future__ import annotations

import os

import jax


def initialize_multihost(coordinator: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> bool:
    """Initialize jax.distributed when running multi-host.

    With no arguments, relies on the TPU environment auto-detection
    (GKE/GCE metadata); explicit arguments support manual clusters.  Returns
    True when distributed mode was initialized, False for single-process
    runs (no-op, so the same entrypoints work at n=1).
    """
    if num_processes is None:
        num_processes = int(os.environ.get("FDOCT_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator is None:
        return False
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return True
