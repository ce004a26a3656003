"""RT solvers: discrete ordinates (disort) and Beer-Lambert.

Abstract interface parity with the reference's ``RTSolverImpl::forward(prop,
bc, temf) -> flux`` (``/root/reference/src/rtsolver/rtsolver.hpp:21-30``):
every solver exposes ``forward(prop, bc, temf=None)`` where ``prop`` is
``(nwave, ncol, nlyr, nprop)`` bottom-up and the result is
``(nwave, ncol, nlyr+1, 2)`` bottom-up level fluxes (IUP/IDN).
"""

from .disort.disort import Disort, DisortOptions
from .beer_lambert import BeerLambert, BeerLambertOptions, toa_radiance
from .scattering_moments import (
    PhaseMomentOptions,
    scattering_moments,
    kIsotropic,
    kRayleigh,
    kHenyeyGreenstein,
    kDoubleHenyeyGreenstein,
)
