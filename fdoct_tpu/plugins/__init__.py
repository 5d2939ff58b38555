"""Per-variant analysis plugins.

Each plugin implements the informal protocol the Session expects:

- ``key(session, ch) -> bool`` — handle a keypress, True if consumed.
- ``on_bscan(session, result) -> None`` — called with every completed
  (displayed) B-scan group.
"""

from fdoct_tpu.plugins.vibrometry import (  # noqa: F401
    VibrometryPlugin, bessel_db_inverse, errnull, render_vib_profile)
from fdoct_tpu.plugins.roi import ROIPlugin  # noqa: F401
from fdoct_tpu.plugins.jmask import JMaskPlugin  # noqa: F401
