"""Phase-function moment generators.

API parity with pydisort's ``disort::scattering_moments(nstr, options)``
(used at ``/root/reference/tests/test_disort.cpp:43-46``), which wraps
cdisort's GETMOM: given a phase-function type, produce the Legendre moment
vector ``g_1..g_nmom`` (g_0 = 1 is implicit, matching the solver's ``pmom``
input convention).
"""

from __future__ import annotations

import dataclasses

import numpy as np

kIsotropic = "isotropic"
kRayleigh = "rayleigh"
kHenyeyGreenstein = "henyey_greenstein"
kDoubleHenyeyGreenstein = "double_henyey_greenstein"


@dataclasses.dataclass(frozen=True)
class PhaseMomentOptions:
    type: str = kIsotropic
    gg: float = 0.0    # HG asymmetry parameter
    gg1: float = 0.0   # double-HG forward lobe
    gg2: float = 0.0   # double-HG backward lobe
    ff: float = 0.0    # double-HG forward fraction

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def scattering_moments(nmom: int, options: PhaseMomentOptions = PhaseMomentOptions()) -> np.ndarray:
    """Moments g_1..g_nmom for the requested phase function."""
    ls = np.arange(1, nmom + 1)
    if options.type == kIsotropic:
        return np.zeros(nmom)
    if options.type == kRayleigh:
        out = np.zeros(nmom)
        if nmom >= 2:
            out[1] = 0.1  # g_2 = 1/10 for p = 3/4 (1 + cos^2)
        return out
    if options.type == kHenyeyGreenstein:
        if not -1.0 < options.gg < 1.0:
            raise ValueError(f"HG asymmetry must be in (-1,1), got {options.gg}")
        return options.gg**ls
    if options.type == kDoubleHenyeyGreenstein:
        f = options.ff
        return f * options.gg1**ls + (1.0 - f) * options.gg2**ls
    raise ValueError(f"unknown phase function type: {options.type}")
