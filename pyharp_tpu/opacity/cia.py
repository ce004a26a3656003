"""Collision-induced absorption (CIA) attenuators.

Parity with the reference's hydrogen CIA absorbers
(``/root/reference/src/opacity/hydrogen_cia.cpp_`` and ``xiz_h2he_cia.cpp_``,
legacy; factory names ``XIZ-H2-H2-CIA`` / ``XIZ-H2-He-CIA`` at
``absorber_factory.cpp_:81-118``):

* XIZ text table: first line ``junk T1 T2 ... Tn``; following lines
  ``wavenumber k(T1) ... k(Tn)`` where ``k`` holds the *negative log* cross
  section in cm^-1 amagat^-2 (the legacy evaluates ``100 exp(-k)``,
  ``hydrogen_cia.cpp_:97-99``);
* attenuation = 100 exp(-k(nu, T)) * amagat_a * amagat_b  [1/m], with
  amagat = x p / (kB T Lo) (``hydrogen_cia.cpp_:92-99``);
* the legacy torch ``grid_sample`` bilinear lookup becomes the same
  vectorized ``interpn`` the rest of the opacity layer uses (the
  ``AtmToStandardGrid`` normalization trick is unnecessary — searchsorted
  needs no [-1,1] rescaling).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import Array

from ..core import constants
from ..core.module import pytree_dataclass, static_field
from ..interp.interpn import interpn
from ..tables.ascii import decomment_file
from ..tables.resource import find_resource
from .base import AttenuatorOptions


def load_xiz_table(filename: str):
    """Read a XIZ-format CIA table -> (wavenumber, temperature, kdata)."""
    path = find_resource(filename)
    rows = [ln.split() for ln in decomment_file(path).splitlines() if ln.split()]
    header = rows[0]
    temps = np.asarray([float(x) for x in header[1:]], np.float64)
    wave = np.asarray([float(r[0]) for r in rows[1:]], np.float64)
    k = np.asarray([[float(x) for x in r[1:]] for r in rows[1:]], np.float64)
    if k.shape != (wave.size, temps.size):
        raise ValueError(f"{path}: ragged XIZ table")
    if wave.size > 1 and wave[0] > wave[-1]:
        wave = wave[::-1].copy(); k = k[::-1].copy()
    if temps.size > 1 and temps[0] > temps[-1]:
        temps = temps[::-1].copy(); k = k[:, ::-1].copy()
    return wave, temps, k


def write_xiz_table(filename, wave, temps, kdata):
    """Write the XIZ text format (test fixture helper)."""
    with open(filename, "w") as f:
        f.write("0 " + " ".join(f"{t:.12g}" for t in temps) + "\n")
        for i, w in enumerate(wave):
            f.write(f"{w:.12g} " + " ".join(f"{v:.12g}" for v in kdata[i]) + "\n")


@pytree_dataclass
class XizCIA:
    """One CIA pair (e.g. H2-H2): bilinear (nu, T) lookup + amagat^2 scaling."""

    kwave: Array   # (nw,) cm^-1 ascending
    ktemp: Array   # (nt,) K ascending
    kdata: Array   # (nw, nt) negative-log cross section [cm^-1 amagat^-2]
    options: AttenuatorOptions = static_field(default=AttenuatorOptions())
    mix_b_fraction: float = static_field(default=1.0)  # x_b / x_a (e.g. xHe)

    nprop: int = static_field(default=1)

    @classmethod
    def from_options(cls, options: AttenuatorOptions, dtype=jnp.float32,
                     mix_b_fraction: float = 1.0) -> "XizCIA":
        if len(options.opacity_files) != 1:
            raise ValueError("Only one opacity file is allowed")
        wave, temps, k = load_xiz_table(options.opacity_files[0])
        return cls(
            kwave=jnp.asarray(wave, dtype),
            ktemp=jnp.asarray(temps, dtype),
            kdata=jnp.asarray(k, dtype),
            options=options,
            mix_b_fraction=mix_b_fraction,
        )

    def forward(self, conc: Array, **kwargs: Array) -> Array:
        """Attenuation [1/m], shape ``(nwave, ncol, nlyr, 1)``.

        Args:
          conc: (ncol, nlyr, nspecies) [mol/m^3]; species_ids[0] selects the
            primary collider (e.g. H2).
          kwargs: ``wavenumber`` (nwave,), ``pres`` and ``temp`` (ncol, nlyr).
        """
        if "wavenumber" not in kwargs:
            raise ValueError("wavenumber is required in kwargs")
        if "temp" not in kwargs:
            raise ValueError("temp is required in kwargs")
        wn = kwargs["wavenumber"]
        temp = kwargs["temp"]                      # (ncol, nlyr)

        nwave = wn.shape[0]
        ncol, nlyr = temp.shape
        # bilinear in (nu, T): queries = outer(wn, temp)
        q_w = jnp.broadcast_to(wn[:, None, None], (nwave, ncol, nlyr))
        q_t = jnp.broadcast_to(temp[None], (nwave, ncol, nlyr))
        lnk = interpn([q_w, q_t], self.kdata, [self.kwave, self.ktemp])

        # amagat of the primary collider from its molar density
        c_a = conc[..., self.options.species_ids[0]]   # (ncol, nlyr) mol/m^3
        n_a = c_a * 6.02214076e23                      # molecules / m^3
        amagat_a = n_a / constants.Lo
        amagat_b = amagat_a * self.mix_b_fraction
        out = 100.0 * jnp.exp(-lnk) * (amagat_a * amagat_b)[None]
        return out[..., None]


def H2H2CIA(options: AttenuatorOptions, dtype=jnp.float32) -> XizCIA:
    """H2-H2 CIA (factory name ``XIZ-H2-H2-CIA``)."""
    return XizCIA.from_options(options, dtype, mix_b_fraction=1.0)


def H2HeCIA(options: AttenuatorOptions, dtype=jnp.float32,
            xhe_over_xh2: float = 0.135) -> XizCIA:
    """H2-He CIA (factory name ``XIZ-H2-He-CIA``); default He/H2 ratio solar."""
    return XizCIA.from_options(options, dtype, mix_b_fraction=xhe_over_xh2)
