"""Attenuator options and protocol.

Parity with the reference option struct
(``/root/reference/src/opacity/attenuator_options.hpp:8-18``), whose fluent
``ADD_ARG`` setters map to a frozen dataclass with ``replace``-style updates.

Every attenuator's ``forward(conc, **kwargs)`` returns optical properties of
shape ``(nwave, ncol, nlyr, nprop)`` with the property axis indexed by
``core.index`` (IEX extinction [1/m], ISS attenuation-weighted single
scattering albedo, IPM.. attenuation*ssa-weighted phase moments) — the
attenuator-side layout of ``rfm.hpp:64-71``.
"""

from __future__ import annotations

import dataclasses
from typing import Protocol

from jax import Array


@dataclasses.dataclass(frozen=True)
class AttenuatorOptions:
    type: str = ""
    opacity_files: tuple[str, ...] = ()
    species_ids: tuple[int, ...] = ()
    species_names: tuple[str, ...] = ()
    species_weights: tuple[float, ...] = ()  # kg/mol

    def replace(self, **kw) -> "AttenuatorOptions":
        return dataclasses.replace(self, **kw)


class Attenuator(Protocol):
    options: AttenuatorOptions
    nprop: int

    def forward(self, conc: Array, **kwargs: Array) -> Array: ...
