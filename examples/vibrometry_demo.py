"""Vibrometry workflow demo (the BscanFFTpeak use case, hardware-free).

A scatterer vibrates with a known amplitude; the peak-hold protocol
(hold 1/2 = still reference, hold 3 = vibrating) recovers the amplitude via
the Bessel-J0-null inversion, and the displacement profile is rendered the
way the reference's "Vibration profile" window shows it.

Run: python examples/vibrometry_demo.py
"""

import sys
from pathlib import Path as _P
sys.path.insert(0, str(_P(__file__).resolve().parent.parent))  # run from a checkout

import numpy as np
import jax.numpy as jnp

from fdoct_tpu.config import PipelineConfig
from fdoct_tpu.plugins import VibrometryPlugin
from fdoct_tpu.plugins.vibrometry import render_vib_profile
from fdoct_tpu.session import Session
from fdoct_tpu.sources.synthetic import SyntheticSource
from fdoct_tpu.utils.imageio import write_png


def main() -> None:
    cfg = PipelineConfig(width=512, height=16, averages=1,
                         numfftpoints=1024, numdisplaypoints=320,
                         dtype="float32", peakholdnumframes=30)
    amp_nm = 80.0

    still = SyntheticSource(height=16, width=512, depths_um=(45.0,),
                            reflectivities=(0.5,))
    vibrating = SyntheticSource(height=16, width=512, depths_um=(45.0,),
                                reflectivities=(0.5,),
                                vibration_amp_nm=amp_nm)

    session = Session(cfg, variant="peak")   # auto-attaches VibrometryPlugin
    plug: VibrometryPlugin = session.plugins[0]
    session.data_yb = jnp.asarray(
        np.maximum(still.background(), 1).astype(np.float32))
    session.ascanat = 8
    plug.set_roi(x=4, y=20, w=8, h=280)

    def hold(key, source):
        session.key(key)
        it = iter(source.frames())
        while plug.active_hold is not None:
            session.process(next(it))

    hold("1", still)       # reference hold
    hold("2", still)       # repeat (error estimate)
    hold("3", vibrating)   # vibrating hold

    print(f"true amplitude : {amp_nm:.1f} nm")
    print(f"measured       : {plug.dispnm:.1f} ± {plug.errnm:.1f} nm")
    write_png("vibration_profile.png", render_vib_profile(plug.profile))
    print("profile written to vibration_profile.png")


if __name__ == "__main__":
    main()
