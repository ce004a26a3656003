"""Radiation: multi-band container.

Parity with ``/root/reference/src/radiation/radiation.{hpp,cpp}``:

* ``RadiationOptions.set_flags`` parses the flag string
  ``time_dependent, broad_band, stellar_beam, write_bin_radiance``
  (``radiation.cpp:18-36``, unknown flags raise);
* construction builds one ``RadiationBand`` per configured band, propagating
  shared ``outdirs`` (``radiation.cpp:43-53``);
* ``forward`` runs every band and sums band fluxes (the reference's loop is
  commented out mid-refactor, ``radiation.cpp:70-78`` — this build completes
  it), optionally applying the spherical area/volume correction when
  geometry is provided (``radiation.cpp:59-68``).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from jax import Array

from ..utils.spherical import spherical_flux_correction
from .band import RadiationBand, RadiationBandOptions
from .shared import shared

_KNOWN_FLAGS = {"time_dependent", "broad_band", "stellar_beam",
                "write_bin_radiance"}


@dataclasses.dataclass(frozen=True)
class RadiationOptions:
    """Mirror of ``RadiationOptions`` (``radiation.hpp:19-36``)."""

    outdirs: str = ""
    time_dependent: bool = False
    broad_band: bool = False
    stellar_beam: bool = False
    write_bin_radiance: bool = False
    bands: tuple[str, ...] = ()
    band_options: tuple[RadiationBandOptions, ...] = ()

    def set_flags(self, s: str) -> "RadiationOptions":
        out = {}
        for tok in s.replace(",", " ").split():
            if tok not in _KNOWN_FLAGS:
                raise ValueError(
                    f"RadiationOptions::set_flags: flag: '{tok}' unrecognized")
            out[tok] = True
        return dataclasses.replace(self, **out)

    def replace(self, **kw) -> "RadiationOptions":
        return dataclasses.replace(self, **kw)


class Radiation:
    def __init__(self, options: RadiationOptions, dtype=jnp.float32):
        if len(options.bands) != len(options.band_options):
            raise ValueError("bands and band_options must align")
        self.options = options
        self.bands: dict[str, RadiationBand] = {}
        for name, bop in zip(options.bands, options.band_options):
            if options.outdirs:
                bop = bop.replace(outdirs=options.outdirs)
            self.bands[name] = RadiationBand(bop.replace(name=name), dtype)

    def forward(
        self,
        conc: Array,
        dz: Array,
        bc: dict[str, dict[str, Array] | Array],
        atm: dict[str, Array] | None = None,
        x1f: Array | None = None,
        area: Array | None = None,
        vol: Array | None = None,
        return_aux: bool = False,
    ):
        """Total net band-summed flux ``(ncol, nlyr+1, 2)`` (bottom-up).

        ``bc`` may be flat (shared across bands) or nested per band name.
        Per-band spectral reduction follows the band's grid convention
        (:meth:`RadiationBand.spectral_reduce`): ck quadrature, plain sum of
        bin-integrated thermal bins, or rectangle-rule width weighting for
        beam bands in spectral-density units.
        """
        total = None
        aux: dict[str, Array] = {}
        for name, band in self.bands.items():
            band_bc = bc.get(name, bc) if isinstance(bc, dict) else bc
            flux = band.forward(conc, dz, band_bc, atm)  # (nwave,ncol,nlvl,2)
            aux[f"radiation/{name}/flux"] = flux
            bflx = band.spectral_reduce(flux)
            total = bflx if total is None else total + bflx

        if area is None and "coordinate/area1" in shared:
            area = shared["coordinate/area1"]
        if vol is None and "coordinate/vol" in shared:
            vol = shared["coordinate/vol"]
        if x1f is not None and area is not None and vol is not None:
            # correct both up and down flux profiles along the level axis
            up = spherical_flux_correction(total[..., 0], x1f, area, vol)
            dn = spherical_flux_correction(total[..., 1], x1f, area, vol)
            total = jnp.stack([up, dn], axis=-1)

        if return_aux:
            return total, aux
        return total

    # -- radiances (legacy CalBandRadiance / write_bin_radiance path) ------

    def band_radiances(
        self,
        conc: Array,
        dz: Array,
        bc: dict[str, dict[str, Array] | Array],
        atm: dict[str, Array] | None = None,
    ) -> dict[str, Array]:
        """TOA radiances at each band's configured out-directions.

        Port of the legacy radiance path (``rt_solver_disort.cpp_:210-286``):
        per band, solve intensities and gather the user rays.  Only bands
        with ``outdirs`` participate.  Returns band name -> (nwave, ncol,
        nray).
        """
        out = {}
        for name, band in self.bands.items():
            if band.rayout.shape[0] == 0:
                continue
            band_bc = bc.get(name, bc) if isinstance(bc, dict) else bc
            out[name] = band.band_radiance(conc, dz, band_bc, atm)
        return out

    def write_radiances(
        self,
        prefix: str,
        conc: Array,
        dz: Array,
        bc: dict[str, dict[str, Array] | Array],
        atm: dict[str, Array] | None = None,
        column: int = 0,
    ) -> list[str]:
        """Write per-band TOA radiance tables (the ``write_bin_radiance``
        flag's behavior, ``write_bin_ascii.cpp_:10-52``): binary when the
        flag is set, ASCII otherwise.  Eager/host-side.  Returns the paths
        written."""
        from ..utils.output import write_radiance_ascii, write_radiance_bin

        import numpy as np

        paths = []
        for name, rad in self.band_radiances(conc, dz, bc, atm).items():
            band = self.bands[name]
            data = np.asarray(rad)[:, column, :]          # (nwave, nray)
            if self.options.write_bin_radiance:
                path = f"{prefix}{name}.out"
                write_radiance_bin(path, data, band.rayout)
            else:
                path = f"{prefix}{name}.txt"
                wave = (np.asarray(band.options.wavenumber)
                        if band.options.wavenumber else None)
                write_radiance_ascii(path, data, band.rayout, wave=wave,
                                     header=f"band {name} TOA radiance")
            paths.append(path)
        return paths
