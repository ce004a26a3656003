"""Attenuators (opacity sources).

Parity with ``/root/reference/src/opacity`` plus the legacy absorber factory's
intended class set (``absorber_factory.cpp_:81-118``).  Every attenuator is a
frozen pytree whose ``forward(conc, **atm) -> (nwave, ncol, nlyr, nprop)``
emits (extinction [1/m], ext-weighted SSA, ext*ssa-weighted phase moments).
"""

from .base import Attenuator, AttenuatorOptions
from .aerosol import S8Fuller, H2SO4Simple, SimpleAerosol
from .rfm import RFM
from .cia import XizCIA, H2H2CIA, H2HeCIA, load_xiz_table, write_xiz_table
from .clouds import SimpleCloud, SimpleCloudOptions, Grey
from .freedman import FreedmanMean, FreedmanSimple, FreedmanCoeffs
from .radio import (RadioVVWAbsorber, RadioCIA, RadioElectron, VVWLine,
                    load_vvw_lines, vvw_shape)

__all__ = [
    "Attenuator", "AttenuatorOptions",
    "S8Fuller", "H2SO4Simple", "SimpleAerosol",
    "RFM",
    "XizCIA", "H2H2CIA", "H2HeCIA", "load_xiz_table", "write_xiz_table",
    "SimpleCloud", "SimpleCloudOptions", "Grey",
    "FreedmanMean", "FreedmanSimple", "FreedmanCoeffs",
    "RadioVVWAbsorber", "RadioCIA", "RadioElectron", "VVWLine",
    "load_vvw_lines", "vvw_shape",
]
