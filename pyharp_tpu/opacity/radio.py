"""Microwave (radio) opacity attenuators.

The reference's legacy absorber factory enumerates a family of radio-band
absorbers used for giant-planet microwave radiometry — ``radio-NH3``,
``radio-H2O``, ``radio-H2S``, ``radio-PH3``, ``radio-CIA``,
``radio-Electron`` (``/root/reference/src/opacity/absorber_factory.cpp_:
128-139``) — whose implementations live in the host model (CANOE), not in
the reference repo.  This module provides TPU-native implementations of the
standard physics behind each class:

* molecular rotational/inversion lines with the **van Vleck-Weisskopf**
  pressure-broadened line shape (the canonical shape for cm/mm-wave
  tropospheric absorption), line data supplied as ASCII tables (JPL/HITRAN
  -style: frequency, intensity at 300 K, lower-state energy, broadening),
  the same data-file pattern as the reference's other table absorbers;
* a nu^2 collision-induced H2 continuum (Goodman 1969-type parameterization
  used throughout planetary radio astronomy);
* free-electron (inverse-bremsstrahlung / Drude) absorption for ionospheric
  contributions.

All attenuators emit the standard ``(nwave, ncol, nlyr, nprop)`` layout with
``prop[..., 0]`` extinction [1/m]; scattering is negligible at these
wavelengths so ``nprop = 1``.

Everything here is elementwise in (wave, col, layer) — XLA fuses the whole
evaluation into a single VPU kernel over the batch; line summation is an
unrolled static loop over the (small) line list.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from jax import Array

from ..core import constants
from ..tables.ascii import read_data_table
from ..tables.resource import find_resource
from .base import AttenuatorOptions

# CODATA SI
_KBOLTZ = constants.kBoltz        # J/K
_C_CGS = 2.99792458e10            # cm/s
_LO = constants.Lo                # Loschmidt m^-3 at STP (amagat)


@dataclasses.dataclass(frozen=True)
class VVWLine:
    nu0: float          # line center [GHz]
    s300: float         # integrated intensity at 300 K [Hz m^2/mol-like scale]
    elow: float         # lower-state energy [K] (E_l / k_B)
    gamma_self: float   # self-broadening [GHz/bar at 300 K]
    gamma_h2: float     # H2-broadening [GHz/bar at 300 K]
    gamma_he: float     # He-broadening [GHz/bar at 300 K]
    n_t: float          # broadening temperature exponent


def load_vvw_lines(path: str) -> tuple[VVWLine, ...]:
    """Load a line table: columns nu0[GHz] S300 E_low[K] g_self g_H2 g_He n.

    Uses the shared decommented-ASCII reader (same machinery as the aerosol
    tables, ``tables/ascii.py``; reference analog ``fileio.cpp:28-133``).
    """
    data = read_data_table(find_resource(path))
    if data.shape[1] < 7:
        raise ValueError(
            f"VVW line table {path} needs 7 columns, got {data.shape[1]}")
    return tuple(VVWLine(*[float(x) for x in row[:7]]) for row in data)


def vvw_shape(nu, nu0: float, dnu):
    """Van Vleck-Weisskopf profile F(nu) [1/GHz].

    F = (nu/nu0)^2 / pi * [dnu/((nu-nu0)^2+dnu^2) + dnu/((nu+nu0)^2+dnu^2)]
    """
    a = dnu / ((nu - nu0) ** 2 + dnu * dnu)
    b = dnu / ((nu + nu0) ** 2 + dnu * dnu)
    return (nu / nu0) ** 2 / jnp.pi * (a + b)


class RadioVVWAbsorber:
    """Line absorber with the van Vleck-Weisskopf shape.

    Absorption [1/m]:

        alpha(nu) = n_abs * sum_lines S(T) F_VVW(nu; nu0, dnu(P, T))

        S(T)  = S300 (300/T)^(3/2 + 1) exp(-E_l (1/T - 1/300))
        dnu   = (g_self P_self + g_H2 P_H2 + g_He P_He) (300/T)^n

    ``forward(conc, pres=..., temp=..., wavenumber=... | frequency_ghz=...)``;
    the spectral grid may be given directly in GHz or as wavenumber [1/cm]
    (converted via nu = c * wn).  Needs the absorber mole fraction (from
    conc) plus optional H2/He mole fractions via ``x_h2``/``x_he`` options.
    """

    nprop = 1

    def __init__(self, options: AttenuatorOptions, lines=None,
                 x_h2: float = 0.86, x_he: float = 0.13, dtype=jnp.float32):
        if len(options.species_ids) != 1:
            raise ValueError("Only one species is allowed")
        self.options = options
        if lines is None:
            if not options.opacity_files:
                raise ValueError(
                    "RadioVVWAbsorber needs a line table (opacity_files) "
                    "or an explicit `lines` tuple")
            lines = load_vvw_lines(options.opacity_files[0])
        self.lines = tuple(lines)
        self.x_h2 = x_h2
        self.x_he = x_he
        self.dtype = dtype

    def _freq_ghz(self, kwargs):
        if "frequency_ghz" in kwargs:
            return jnp.asarray(kwargs["frequency_ghz"], self.dtype)
        if "wavenumber" in kwargs:
            wn = jnp.asarray(kwargs["wavenumber"], self.dtype)   # 1/cm
            return wn * (_C_CGS * 1e-9)                          # GHz
        raise ValueError("need frequency_ghz or wavenumber")

    def forward(self, conc: Array, **kwargs: Array) -> Array:
        """conc (ncol, nlyr, nspecies) [mol/m^3]; pres [Pa]; temp [K]."""
        pres = jnp.asarray(kwargs["pres"], self.dtype)     # (ncol, nlyr)
        temp = jnp.asarray(kwargs["temp"], self.dtype)
        nu = self._freq_ghz(kwargs)                        # (nwave,)
        sid = self.options.species_ids[0]
        n_abs = jnp.maximum(conc[..., sid].astype(self.dtype), 0.0)

        p_bar = pres * 1e-5                                # Pa -> bar
        # partial pressures: absorber from its own concentration, H2/He from
        # fixed background mole fractions (options); conc is molar [mol/m^3]
        # so the ideal-gas partial pressure needs the molar gas constant
        p_self = n_abs * constants.Rgas * temp * 1e-5
        p_h2 = self.x_h2 * p_bar
        p_he = self.x_he * p_bar
        tr = 300.0 / temp                                  # (ncol, nlyr)

        nu_b = nu[:, None, None]                           # (nwave, 1, 1)
        alpha = jnp.zeros((nu.shape[0],) + temp.shape, self.dtype)
        for ln in self.lines:
            dnu = (ln.gamma_self * p_self + ln.gamma_h2 * p_h2
                   + ln.gamma_he * p_he) * tr ** ln.n_t
            dnu = jnp.maximum(dnu, 1e-8)
            s = ln.s300 * tr ** 2.5 * jnp.exp(
                -ln.elow * (1.0 / temp - 1.0 / 300.0))
            alpha = alpha + (s * vvw_shape(nu_b, ln.nu0, dnu[None]))
        alpha = alpha * n_abs[None]                        # [1/m]
        return alpha[..., None]


class RadioCIA:
    """H2 collision-induced nu^2 microwave continuum.

    Goodman (1969)-type parameterization (the form used by de Pater-type
    radiative-transfer models for the giant planets):

        alpha [1/m] = A * nu_GHz^2 * D_H2 * (D_H2 + b_He D_He)
                      * (T / 300)^(-t_exp)

    with D in amagat.  ``A``, ``b_He`` and ``t_exp`` are options (the
    literature spans a range of fitted values; defaults give the canonical
    nu^2, rho^2, steep-negative-T behavior).
    """

    nprop = 1

    def __init__(self, options: AttenuatorOptions, A: float = 2.3e-8,
                 b_he: float = 1.38, t_exp: float = 2.7,
                 x_h2: float = 0.86, x_he: float = 0.13, dtype=jnp.float32):
        self.options = options
        self.A = A
        self.b_he = b_he
        self.t_exp = t_exp
        self.x_h2 = x_h2
        self.x_he = x_he
        self.dtype = dtype

    def forward(self, conc: Array, **kwargs: Array) -> Array:
        pres = jnp.asarray(kwargs["pres"], self.dtype)
        temp = jnp.asarray(kwargs["temp"], self.dtype)
        if "frequency_ghz" in kwargs:
            nu = jnp.asarray(kwargs["frequency_ghz"], self.dtype)
        else:
            nu = jnp.asarray(kwargs["wavenumber"], self.dtype) * (
                _C_CGS * 1e-9)
        n_tot = pres / (_KBOLTZ * temp)                   # mol. number / m^3
        d_h2 = self.x_h2 * n_tot / _LO                    # amagat
        d_he = self.x_he * n_tot / _LO
        alpha = (self.A * (nu[:, None, None] ** 2)
                 * d_h2[None] * (d_h2 + self.b_he * d_he)[None]
                 * (temp[None] / 300.0) ** (-self.t_exp))
        return alpha[..., None]


class RadioElectron:
    """Free-electron (inverse bremsstrahlung / Drude) absorption.

    For a weakly-ionized atmosphere with electron density n_e and
    electron-neutral collision frequency nu_c:

        alpha [1/m] = (nu_p^2 nu_c) / (c (nu^2 + (nu_c / 2 pi)^2)),
        nu_p^2 = n_e e^2 / (4 pi^2 eps0 m_e)   [Hz^2]

    nu is ordinary frequency [Hz] while the collision rate nu_c is angular
    [rad/s]; the standard Drude form omega_p^2 nu_c / (c (omega^2 + nu_c^2))
    divided through by (2 pi)^2 puts nu_c^2/(4 pi^2) in the denominator.

    nu_c is modeled as ``k_coll * n_neutral * sqrt(T)`` with the rate
    coefficient an option (electron-H2 momentum-transfer collisions).
    The attenuator species is the electron density [mol/m^3-equivalent
    count: electrons/m^3 when conc carries number density].
    """

    nprop = 1
    _E = 1.602176634e-19
    _ME = 9.1093837015e-31
    _EPS0 = 8.8541878128e-12
    _CLIGHT = 2.99792458e8

    def __init__(self, options: AttenuatorOptions,
                 k_coll: float = 1.0e-13,   # m^3/s per sqrt(K)
                 dtype=jnp.float32):
        if len(options.species_ids) != 1:
            raise ValueError("Only one species is allowed")
        self.options = options
        self.k_coll = k_coll
        self.dtype = dtype

    def forward(self, conc: Array, **kwargs: Array) -> Array:
        pres = jnp.asarray(kwargs["pres"], self.dtype)
        temp = jnp.asarray(kwargs["temp"], self.dtype)
        if "frequency_ghz" in kwargs:
            nu = jnp.asarray(kwargs["frequency_ghz"], self.dtype) * 1e9
        else:
            nu = jnp.asarray(kwargs["wavenumber"], self.dtype) * _C_CGS
        n_e = jnp.maximum(
            conc[..., self.options.species_ids[0]].astype(self.dtype), 0.0)
        n_neutral = pres / (_KBOLTZ * temp)
        nu_c = self.k_coll * n_neutral * jnp.sqrt(temp)       # Hz
        nu_p2 = n_e * self._E ** 2 / (
            4.0 * jnp.pi ** 2 * self._EPS0 * self._ME)        # Hz^2
        nu_c2 = (nu_c / (2.0 * jnp.pi)) ** 2   # angular -> ordinary freq^2
        alpha = (nu_p2 * nu_c)[None] / (
            self._CLIGHT * (nu[:, None, None] ** 2 + nu_c2[None]))
        return alpha[..., None]
