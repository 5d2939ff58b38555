"""Algorithmic kernel library.

The reference copy-pastes these helpers into every executable
(BscanFFT.cpp:88-347 is the canonical copy); here they are a single,
jit-friendly, batched op library over ``(..., n_lambda)`` arrays.
"""

from fdoct_tpu.ops.windows import (  # noqa: F401
    barthann, hann, hamming, tukey, gaussian, blackmanharris, get_window,
)
from fdoct_tpu.ops.scale import (  # noqa: F401
    to_db, normalize_minmax, normalize_rows, make_only_positive,
    threshold_floor, to_uint8,
)
from fdoct_tpu.ops.filters import (  # noqa: F401
    smooth_moving_average, median_blur, bin_area, resize_area, resize_bicubic,
)
from fdoct_tpu.ops.fft import (  # noqa: F401
    zeropad_rowwise, lowpass_rowwise, ifft_mag_rows,
)
from fdoct_tpu.ops.resample import (  # noqa: F401
    resample_klinear, resample_matrix,
)
from fdoct_tpu.ops.dispersion import dispersion_phase, apply_dispersion  # noqa: F401
from fdoct_tpu.ops.hilbert import analytic_signal, hilbert_reconstruct  # noqa: F401
