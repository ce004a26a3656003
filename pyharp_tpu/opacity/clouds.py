"""Parametric cloud / grey attenuators.

Parity targets from the reference's intended absorber set
(``/root/reference/src/opacity/absorber_factory.cpp_:81-118``):

* ``SimpleCloud``: wavelength-independent cloud optics — extinction cross
  section per particle, single-scattering albedo and asymmetry parameter set
  by options (the CANOE legacy class is config-driven the same way);
* ``Grey``: constant mass-extinction absorber, useful for semi-grey
  radiative-convective modeling and as a test fixture.

Both emit the standard attenuator layout ``(nwave, ncol, nlyr, nprop)``.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from jax import Array

from .base import AttenuatorOptions


@dataclasses.dataclass(frozen=True)
class SimpleCloudOptions:
    kext: float = 1.0e-3   # extinction cross section [m^2/mol]
    ssa: float = 0.9       # single-scattering albedo
    gg: float = 0.8        # Henyey-Greenstein asymmetry
    nmom: int = 0          # phase moments emitted (g^l); 0 -> ssa only


class SimpleCloud:
    """Grey scattering cloud: k = kext * conc, fixed ssa and HG moments."""

    def __init__(self, options: AttenuatorOptions,
                 cloud: SimpleCloudOptions = SimpleCloudOptions(),
                 dtype=jnp.float32):
        if len(options.species_ids) != 1:
            raise ValueError("Only one species is allowed")
        self.options = options
        self.cloud = cloud
        self.dtype = dtype
        self.nprop = 2 + cloud.nmom

    def forward(self, conc: Array, **kwargs: Array) -> Array:
        if "wavenumber" in kwargs:
            nwave = kwargs["wavenumber"].shape[0]
        elif "wavelength" in kwargs:
            nwave = kwargs["wavelength"].shape[0]
        else:
            nwave = 1
        c = conc[..., self.options.species_ids[0]].astype(self.dtype)
        att = self.cloud.kext * c                        # (ncol, nlyr)
        att = jnp.broadcast_to(att[None], (nwave,) + att.shape)
        parts = [att, self.cloud.ssa * att]
        for l in range(1, self.cloud.nmom + 1):
            parts.append((self.cloud.gg ** l) * self.cloud.ssa * att)
        return jnp.stack(parts, axis=-1)


class Grey:
    """Constant mass-extinction absorber: k = kappa * conc (no scattering)."""

    def __init__(self, options: AttenuatorOptions, kappa: float = 1.0e-4,
                 dtype=jnp.float32):
        if len(options.species_ids) != 1:
            raise ValueError("Only one species is allowed")
        self.options = options
        self.kappa = kappa
        self.dtype = dtype
        self.nprop = 1

    def forward(self, conc: Array, **kwargs: Array) -> Array:
        if "wavenumber" in kwargs:
            nwave = kwargs["wavenumber"].shape[0]
        elif "wavelength" in kwargs:
            nwave = kwargs["wavelength"].shape[0]
        else:
            nwave = 1
        c = conc[..., self.options.species_ids[0]].astype(self.dtype)
        att = self.kappa * c
        att = jnp.broadcast_to(att[None], (nwave,) + att.shape)
        return att[..., None]
