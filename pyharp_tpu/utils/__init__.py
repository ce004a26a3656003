"""Utilities: radiation-direction parsing, spherical flux correction,
radiance writers, string vectorize (parity with ``src/utils``)."""

from . import checkpoint
from .directions import parse_radiation_directions, get_direction_grids
from .spherical import spherical_flux_correction
from .output import (
    write_radiance_ascii,
    write_radiance_bin,
    read_radiance_bin,
    vectorize,
)

__all__ = [
    "checkpoint",
    "parse_radiation_directions", "get_direction_grids",
    "spherical_flux_correction",
    "write_radiance_ascii", "write_radiance_bin", "read_radiance_bin",
    "vectorize",
]
