"""Test harness configuration.

Forces JAX onto a virtual 8-device CPU mesh (the reference has no multi-node
test story; SURVEY.md §4 prescribes exactly this XLA_FLAGS approach) and
enables float64 so compat-mode numerics match the reference's C++ doubles.
Must run before jax initializes a backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env may pin JAX_PLATFORMS to a TPU plugin before we run; force CPU for
# the test suite regardless (float64 parity + virtual 8-device mesh).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from fdoct_tpu.config import PipelineConfig  # noqa: E402


@pytest.fixture(scope="session")
def small_cfg() -> PipelineConfig:
    """A small, fast config exercising every pipeline stage (binning,
    zero-pad, non-power-of-two FFT size)."""
    return PipelineConfig(
        width=256, height=64, binvalue=2, averages=3,
        numfftpoints=320, numdisplaypoints=100,
        lambdamin=816e-9, lambdamax=884e-9,
        increasefftpointsmultiplier=2, mediann=0, movavgn=0,
        dtype="float64", compat=True,
    )


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(42)
