"""Grayscale/color PNG IO for frames and B-scans.

The reference saves everything through cv::imwrite (savematasimage,
BscanFFT.cpp:307-327) and the batch path writes 16-bit Trig PNGs
(BscanFFTspinj.cpp:258-347).  Supports 8/16-bit grayscale and 8-bit RGB.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image


def read_png(path: str | Path) -> np.ndarray:
    """Read a PNG as a numpy array; grayscale stays 2D (uint8/uint16),
    color becomes (h, w, 3) uint8."""
    img = Image.open(path)
    if img.mode in ("I;16", "I;16B", "I"):
        return np.asarray(img, dtype=np.uint16)
    if img.mode in ("L",):
        return np.asarray(img, dtype=np.uint8)
    return np.asarray(img.convert("RGB"), dtype=np.uint8)


def read_png_gray(path: str | Path, channel: int = 0) -> np.ndarray:
    """Read a PNG and return one channel, the way the simulator does
    ``split(mraw, chan)`` and keeps chan[0] (BscanFFTsim.cpp:778-779)."""
    arr = read_png(path)
    if arr.ndim == 3:
        # PIL gives RGB ordering; OpenCV's chan[0] is Blue
        return arr[..., 2 - channel] if channel < 3 else arr.sum(-1)
    return arr


def write_png(path: str | Path, arr: np.ndarray) -> None:
    """Write uint8/uint16 grayscale or uint8 RGB PNG."""
    arr = np.asarray(arr)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if arr.ndim == 2 and arr.dtype == np.uint16:
        Image.fromarray(arr).save(path)  # PIL infers I;16 for uint16
    elif arr.ndim == 2:
        Image.fromarray(arr.astype(np.uint8), mode="L").save(path)
    else:
        Image.fromarray(arr.astype(np.uint8), mode="RGB").save(path)
