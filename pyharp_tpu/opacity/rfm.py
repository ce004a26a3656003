"""RFM gas opacity (line-by-line / correlated-k table lookup).

Parity with ``/root/reference/src/opacity/rfm.cpp:122-197``:

* temperature anomaly vs the table's reference atmosphere:
  ``tempa = temp - reftemp(ln p)`` (``rfm.cpp:135-137``, ``get_reftemp``
  at ``rfm.cpp:171-197``);
* 3-D multilinear interpolation of ``ln k`` in (wavenumber, ln p, dT)
  (``rfm.cpp:143-159``);
* attenuation ``1e-3 * exp(lnk) * conc[species]`` [1/m]
  (``rfm.cpp:166-168``; the 1e-3 converts m^2/kmol to m^2/mol);
* output shape ``(nwave, ncol, nlyr, 1)``.

TPU-native: the wave axis of the query equals the table's own wave axis, so
the wave dimension needs no search at all — the lookup reduces to a batched
2-D (ln p, dT) interpolation per wave index, implemented as searchsorted +
gather and fused by XLA.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from ..core.module import pytree_dataclass, static_field
from ..interp.interpn import interp1, _bracket
from ..tables.rfm import load_rfm_table
from .base import AttenuatorOptions


@pytree_dataclass
class RFM:
    kwave: Array    # (nwave,) wavenumber grid (or g-point index grid)
    klnp: Array     # (npres,) ln-pressure axis, ascending
    ktemp: Array    # (ntemp,) temperature-anomaly axis, ascending
    krefatm: Array  # (npres,) reference temperature on klnp
    kdata: Array    # (nwave, npres, ntemp) ln k [m^2/kmol]
    weights: Array | None  # (nwave,) ck weights or None
    options: AttenuatorOptions = static_field(default=AttenuatorOptions())

    nprop: int = static_field(default=1)

    @classmethod
    def from_options(cls, options: AttenuatorOptions, dtype=jnp.float32) -> "RFM":
        if len(options.opacity_files) != 1:
            raise ValueError("Only one opacity file is allowed")
        if len(options.species_ids) != 1:
            raise ValueError("Only one species is allowed")
        if options.species_ids[0] < 0:
            raise ValueError(f"Invalid species_id: {options.species_ids[0]}")
        if options.type and options.type != "rfm":
            raise ValueError(f"Mismatch type: {options.type}")

        name = options.species_names[options.species_ids[0]]
        tab = load_rfm_table(options.opacity_files[0], name)
        return cls(
            kwave=jnp.asarray(tab.wavenumber, dtype),
            klnp=jnp.asarray(tab.lnp, dtype),
            ktemp=jnp.asarray(tab.tempgrid, dtype),
            krefatm=jnp.asarray(tab.reftemp, dtype),
            kdata=jnp.asarray(tab.kdata, dtype),
            weights=None if tab.weights is None else jnp.asarray(tab.weights, dtype),
            options=options,
        )

    def get_reftemp(self, lnp: Array) -> Array:
        """Reference-atmosphere temperature at ``lnp``; parity ``rfm.cpp:171-197``."""
        return interp1(lnp, self.krefatm, self.klnp)

    def forward(self, conc: Array, **kwargs: Array) -> Array:
        """Attenuation [1/m], shape ``(nwave, ncol, nlyr, 1)``.

        Args:
          conc: concentrations [mol/m^3], ``(ncol, nlyr, nspecies)``.
          kwargs: ``pres`` [Pa] and ``temp`` [K], each ``(ncol, nlyr)``.
        """
        if "pres" not in kwargs or "temp" not in kwargs:
            raise ValueError("pres and temp are required in kwargs")
        pres = kwargs["pres"]
        temp = kwargs["temp"]

        lnp = jnp.log(pres)                       # (ncol, nlyr)
        tempa = temp - self.get_reftemp(lnp)      # anomaly vs reference atm

        # Batched bilinear lookup in (ln p, dT); wave axis is an exact grid hit.
        plo, phi, pt = _bracket(self.klnp, lnp)    # (ncol, nlyr)
        tlo, thi, tt = _bracket(self.ktemp, tempa)

        k = self.kdata  # (nwave, npres, ntemp)
        # gather 4 corners: result (nwave, ncol, nlyr)
        def corner(ip, it):
            return k[:, ip, it]  # advanced indexing broadcasts (ncol,nlyr) -> (nwave,ncol,nlyr)

        pt = pt.astype(k.dtype)
        tt = tt.astype(k.dtype)
        lnk = (
            (1 - pt) * (1 - tt) * corner(plo, tlo)
            + (1 - pt) * tt * corner(plo, thi)
            + pt * (1 - tt) * corner(phi, tlo)
            + pt * tt * corner(phi, thi)
        )

        c = conc[..., self.options.species_ids[0]]  # (ncol, nlyr)
        out = 1.0e-3 * jnp.exp(lnk) * c[None, :, :]
        return out[..., None]
