"""Tabulated aerosol opacities: S8 (Fuller) and H2SO4.

Parity with the reference modules
``/root/reference/src/opacity/s8_fuller.cpp:10-117`` and
``h2so4_simple.cpp:10-117`` (identical structure, different tables):

* 3-column ASCII table (wavelength [um], k_ext [m^2/kg], SSA);
* extinction converted to m^2/mol via the species molecular weight
  (``s8_fuller.cpp:69``);
* ``forward(conc, wavelength=|wavenumber=)``: 1-D interpolation in wavelength
  (wavenumber queries converted via ``1e4/wavenumber``, ``s8_fuller.cpp:79-84``),
  output ``(nwave, ncol, nlyr, 2)`` = (attenuation [1/m],
  attenuation-weighted SSA) (``s8_fuller.cpp:110-116``).

TPU-native: the per-element TensorIterator loop becomes one vectorized
``interpn`` over the wave batch; the whole forward is jit/vmap/shard friendly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import Array

from ..core.module import pytree_dataclass, static_field
from ..interp.interpn import interpn
from ..tables.ascii import read_data_table
from .base import AttenuatorOptions


@pytree_dataclass
class SimpleAerosol:
    """Shared implementation of the 1-D tabulated aerosol attenuators."""

    kwave: Array  # (ntab,) wavelength [um], ascending
    kdata: Array  # (ntab, 2) = (k_ext [m^2/mol], ssa)
    options: AttenuatorOptions = static_field(default=AttenuatorOptions())

    nprop: int = static_field(default=2)

    @classmethod
    def from_options(cls, options: AttenuatorOptions, expected_type: str,
                     dtype=jnp.float32) -> "SimpleAerosol":
        if len(options.opacity_files) != 1:
            raise ValueError("Only one opacity file is allowed")
        if len(options.species_ids) != 1:
            raise ValueError("Only one species is allowed")
        if options.species_ids[0] < 0:
            raise ValueError(f"Invalid species_id: {options.species_ids[0]}")
        # case-insensitive: the reference's band builder spells the type
        # "h2sO4_simple" (radiation_band.cpp:45) — accepted deliberately
        if options.type and options.type.lower() != expected_type:
            raise ValueError(f"Mismatch type: {options.type}")

        table = read_data_table(options.opacity_files[0])
        if table.shape[1] != 3:
            raise ValueError(f"Invalid file: {options.opacity_files[0]}")
        kwave = table[:, 0]
        kdata = table[:, 1:].copy()
        # m^2/kg -> m^2/mol (s8_fuller.cpp:69)
        kdata[:, 0] *= options.species_weights[options.species_ids[0]]
        if kwave[0] > kwave[-1]:  # normalize to ascending for interpn
            kwave = kwave[::-1].copy()
            kdata = kdata[::-1].copy()
        return cls(
            kwave=jnp.asarray(kwave, dtype),
            kdata=jnp.asarray(kdata, dtype),
            options=options,
        )

    def forward(self, conc: Array, **kwargs: Array) -> Array:
        """Optical properties ``(nwave, ncol, nlyr, 2)``.

        Args:
          conc: concentrations [mol/m^3], shape ``(ncol, nlyr, nspecies)``.
          kwargs: ``wavelength`` [um] or ``wavenumber`` [cm^-1], shape ``(nwave,)``.
        """
        if "wavelength" in kwargs:
            coord = kwargs["wavelength"]
        elif "wavenumber" in kwargs:
            coord = 1.0e4 / kwargs["wavenumber"]
        else:
            raise ValueError("wavelength or wavenumber is required in kwargs")

        vals = interpn([coord], self.kdata, [self.kwave])  # (nwave, 2)
        c = conc[..., self.options.species_ids[0]]  # (ncol, nlyr)
        # attenuation [1/m] and attenuation-weighted ssa
        att = vals[:, None, None, 0] * c[None, :, :]
        ssa_w = vals[:, None, None, 1] * att
        return jnp.stack([att, ssa_w], axis=-1)


def S8Fuller(options: AttenuatorOptions, dtype=jnp.float32) -> SimpleAerosol:
    """S8 sulfur aerosol (Fuller data, ``data/s8_k_fuller.txt``)."""
    return SimpleAerosol.from_options(options, "s8_fuller", dtype)


def H2SO4Simple(options: AttenuatorOptions, dtype=jnp.float32) -> SimpleAerosol:
    """H2SO4 aerosol (``data/h2so4.txt``)."""
    return SimpleAerosol.from_options(options, "h2so4_simple", dtype)
