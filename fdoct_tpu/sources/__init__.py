"""Frame sources.

The reference binds four acquisition backends by copy-paste (QHY live
streaming, FLIR Spinnaker, V4L webcam, saved-PNG replay — SURVEY.md §2 L2);
here any iterable of raw frames is a source.  Hardware backends are replaced
by the host-side shim in ``fdoct_tpu.sources.camera`` (shared-memory ring fed
by the native capture daemon); CI runs on the synthetic generator and file
replay, exactly like the reference's BscanFFTsim twin.
"""

from __future__ import annotations

from typing import Iterator, Protocol, runtime_checkable

import numpy as np


@runtime_checkable
class FrameSource(Protocol):
    """A stream of raw interferogram frames (rows = lateral positions,
    cols = wavelength samples) plus the special calibration frames the
    keystroke state machine captures on demand."""

    def frames(self) -> Iterator[np.ndarray]:
        """Yield raw frames (uint8/uint16/float, (h, w))."""
        ...

    def background(self) -> np.ndarray:
        """Source-spectrum frame S(λ) (the 'b' key capture,
        BscanFFT.cpp:1000-1075; sim reads backg.png)."""
        ...

    def pi_frame(self) -> np.ndarray:
        """π-shifted / J0 reference frame (the 'p' key capture,
        BscanFFT.cpp:1077-1099; sim reads piimgi.png)."""
        ...


from fdoct_tpu.sources.synthetic import SyntheticSource, staircase_phantom  # noqa: E402,F401
from fdoct_tpu.sources.replay import ReplaySource, DirectorySource  # noqa: E402,F401
