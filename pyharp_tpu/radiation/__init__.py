"""Radiation drivers: RadiationBand, Radiation, YAML band factory.

Parity with ``/root/reference/src/radiation`` (``radiation_band.{hpp,cpp}``,
``radiation.{hpp,cpp}``, legacy ``radiation_bands_factory.cpp_``).
"""

from .band import RadiationBand, RadiationBandOptions, register_attenuator
from .radiation import Radiation, RadiationOptions
from .factory import create_radiation_options
from .shared import shared

__all__ = [
    "RadiationBand", "RadiationBandOptions", "register_attenuator",
    "Radiation", "RadiationOptions",
    "create_radiation_options",
    "shared",
]
