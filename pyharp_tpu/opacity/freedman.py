"""Freedman mean gas opacities (grey/semi-grey giant-planet modeling).

The reference's legacy absorber factory enumerates ``FreedmanSimple``,
``FreedmanSimple2``, ``FreedmanMean``, ``FreedmanMean2``
(``/root/reference/src/opacity/absorber_factory.cpp_:116-123``); the
implementations live in the host model (CANOE), not in the reference repo.
This module implements the physics those classes wrap:

* **FreedmanMean** — the Rosseland-mean gas opacity surface
  ``kappa(P, T, [M/H])``.  The default is :func:`freedman2014_kappa`, the
  analytic low-P + high-P fit of Freedman et al. (2014), ApJS 214, 25
  (their eqs. 3-5 with the Table 2 coefficients, as transcribed in several
  public radiative-transfer codes).  Pass ``kappa_fn`` to substitute a
  table interpolator; the legacy :class:`FreedmanCoeffs` tanh stand-in
  from r3 remains available as the module-level
  :func:`legacy_tanh_surface` (``kappa_fn=legacy_tanh_surface``).
* **FreedmanSimple** — a power-law opacity
  ``kappa = k0 (P / P0)^a (T / T0)^b`` (the classic semi-grey ansatz the
  CANOE "simple" variants configure), fully option-driven.

Both return extinction [1/m] = kappa [m^2/kg] * rho_species and emit the
standard ``(nwave, ncol, nlyr, 1)`` attenuator layout (grey: constant over
the wave axis).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp
from jax import Array

from .base import AttenuatorOptions


# Freedman et al. (2014) analytic-fit coefficients (their Table 2).
# c1..c7 parameterize the low-pressure term (eq. 4); c8..c13 the
# high-pressure term (eq. 5) with separate sets below/above 800 K.
_F14_LOW = (10.602, 2.882, 6.09e-15, 2.954, -2.526, 0.843, -5.490)
_F14_HI_COLD = (-14.051, 3.055, 0.024, 1.877, -0.445, 0.8321)   # T < 800 K
_F14_HI_HOT = (82.241, -55.456, 8.754, 0.7048, -0.0414, 0.8321)  # T >= 800 K


def freedman2014_kappa(pres: Array, temp: Array, met: float = 0.0) -> Array:
    """Rosseland-mean gas opacity [cm^2/g] — Freedman et al. (2014) fit.

    ``kappa = kappa_lowP + kappa_highP`` (their eq. 3) with

        log kappa_lowP = c1 atan(logT - c2)
                         - c3/(logP + c4) exp((logT - c5)^2)
                         + c6 met + c7                         (eq. 4)
        log kappa_highP = c8 + c9 logT + c10 logT^2
                          + logP (c11 + c12 logT)
                          + c13 met (1/2 + atan((logT-2.5)/0.2)/pi)  (eq. 5)

    P in dyn/cm^2 (input here is Pa, converted), T in K, met = [M/H] dex.
    The high-P coefficient set switches at 800 K (Table 2); implemented as
    a ``where`` so the surface stays jittable (the fit is continuous only
    approximately at the seam, as in the paper).

    Domain guard: the low-P term divides by (log10 P_cgs + c4), which has a
    pole at P ~ 1.1e-3 dyn/cm^2 — BELOW the fit's tabulated domain (the
    Freedman grids start at ~1 ubar = 1 dyn/cm^2).  Pressure is floored at
    0.1 dyn/cm^2 (1e-2 Pa) so evaluations outside the fit domain saturate
    smoothly instead of blowing up to inf extinction.
    """
    dtype = jnp.result_type(pres, temp)
    p_cgs = jnp.maximum(jnp.asarray(pres, dtype) * 10.0, 0.1)
    T = jnp.maximum(jnp.asarray(temp, dtype), 1.0)
    lt = jnp.log10(T)
    lp = jnp.log10(p_cgs)

    c1, c2, c3, c4, c5, c6, c7 = _F14_LOW
    logk_low = (c1 * jnp.arctan(lt - c2)
                - c3 / (lp + c4) * jnp.exp((lt - c5) ** 2)
                + c6 * met + c7)

    def _high(cs):
        c8, c9, c10, c11, c12, c13 = cs
        return (c8 + c9 * lt + c10 * lt * lt + lp * (c11 + c12 * lt)
                + c13 * met * (0.5 + jnp.arctan((lt - 2.5) / 0.2) / jnp.pi))

    logk_high = jnp.where(T < 800.0, _high(_F14_HI_COLD), _high(_F14_HI_HOT))
    return 10.0 ** logk_low + 10.0 ** logk_high


def legacy_tanh_surface(pres: Array, temp: Array, met: float = 0.0,
                        coeffs: "FreedmanCoeffs | None" = None) -> Array:
    """The r3 tanh stand-in opacity surface [cm^2/g] (see
    :class:`FreedmanCoeffs`).  Usable directly as ``kappa_fn``."""
    c = coeffs or FreedmanCoeffs()
    dtype = jnp.result_type(pres, temp)
    p_cgs = jnp.maximum(jnp.asarray(pres, dtype) * 10.0, 1e-10)
    T = jnp.maximum(jnp.asarray(temp, dtype), 1.0)
    lt = jnp.log10(T)
    lp = jnp.log10(p_cgs)
    logk = (c.a0 + c.a1 * jnp.tanh((lt - c.a2) / c.a3)
            + c.a4 * (lp - 6.0) + c.a5 * met)
    return 10.0 ** logk


@dataclasses.dataclass(frozen=True)
class FreedmanCoeffs:
    """Coefficients of the default kappa surface (cgs output: cm^2/g):

        log10 kappa = a0
                      + a1 * tanh((log10 T - a2) / a3)     # T ramp
                      + a4 * (log10 P_cgs - 6)             # ~linear in P
                      + a5 * met                           # metallicity

    Calibrated so that solar-metallicity gas gives kappa ~ 1e-4 cm^2/g at
    (300 K, 1 bar) rising to ~1e-1 cm^2/g at (2500 K, 1 bar) with an
    approximately linear pressure dependence — the leading-order shape of
    the Freedman et al. (2014) Rosseland means.  A qualitative stand-in:
    supply ``kappa_fn`` for quantitative work.
    """

    a0: float = -2.6
    a1: float = 2.1
    a2: float = 3.08    # transition near ~1200 K
    a3: float = 0.33
    a4: float = 0.50
    a5: float = 0.35


class FreedmanMean:
    """Rosseland-mean gas opacity attenuator.

    ``forward(conc, pres=..., temp=...)``: kappa(P, T, [M/H]) converted to
    extinction with the attenuator species' mass density
    ``rho = conc * species_weight``.

    Args:
      kappa_fn: optional ``(pres_Pa, temp_K) -> kappa [cm^2/g]`` override
        (e.g. a table interpolator, or :func:`legacy_tanh_surface` for the
        r3 stand-in); defaults to :func:`freedman2014_kappa`, the
        published Freedman et al. (2014) analytic fit.
    """

    nprop = 1

    def __init__(self, options: AttenuatorOptions,
                 met: float = 0.0,
                 coeffs: FreedmanCoeffs = FreedmanCoeffs(),
                 kappa_fn: Callable[[Array, Array], Array] | None = None,
                 dtype=jnp.float32):
        if len(options.species_ids) != 1:
            raise ValueError("Only one species is allowed")
        self.options = options
        self.met = met
        self.coeffs = coeffs
        self.kappa_fn = kappa_fn
        self.dtype = dtype

    def kappa_cm2g(self, pres: Array, temp: Array) -> Array:
        """Rosseland-mean kappa [cm^2/g] from P [Pa], T [K]."""
        if self.kappa_fn is not None:
            return self.kappa_fn(pres, temp)
        return freedman2014_kappa(pres, temp, self.met)

    def coeff_surface(self, pres: Array, temp: Array) -> Array:
        """The r3 tanh stand-in surface (kept for configs that tuned it)."""
        return legacy_tanh_surface(pres, temp, self.met, self.coeffs)

    def forward(self, conc: Array, **kwargs: Array) -> Array:
        pres = jnp.asarray(kwargs["pres"], self.dtype)   # (ncol, nlyr)
        temp = jnp.asarray(kwargs["temp"], self.dtype)
        if "wavenumber" in kwargs:
            nwave = kwargs["wavenumber"].shape[0]
        elif "wavelength" in kwargs:
            nwave = kwargs["wavelength"].shape[0]
        else:
            nwave = 1
        sid = self.options.species_ids[0]
        mw = self.options.species_weights[sid]           # kg/mol
        rho = jnp.maximum(conc[..., sid].astype(self.dtype), 0.0) * mw
        kappa = self.kappa_cm2g(pres, temp) * 0.1        # cm^2/g -> m^2/kg
        att = kappa * rho                                # 1/m
        att = jnp.broadcast_to(att[None], (nwave,) + att.shape)
        return att[..., None]


class FreedmanSimple:
    """Power-law grey opacity kappa = k0 (P/P0)^a (T/T0)^b [m^2/kg]."""

    nprop = 1

    def __init__(self, options: AttenuatorOptions,
                 k0: float = 1.0e-2, p0: float = 1.0e5, t0: float = 300.0,
                 a: float = 1.0, b: float = 0.0, dtype=jnp.float32):
        if len(options.species_ids) != 1:
            raise ValueError("Only one species is allowed")
        self.options = options
        self.k0, self.p0, self.t0, self.a, self.b = k0, p0, t0, a, b
        self.dtype = dtype

    def forward(self, conc: Array, **kwargs: Array) -> Array:
        pres = jnp.asarray(kwargs["pres"], self.dtype)
        temp = jnp.asarray(kwargs["temp"], self.dtype)
        if "wavenumber" in kwargs:
            nwave = kwargs["wavenumber"].shape[0]
        elif "wavelength" in kwargs:
            nwave = kwargs["wavelength"].shape[0]
        else:
            nwave = 1
        sid = self.options.species_ids[0]
        mw = self.options.species_weights[sid]
        rho = jnp.maximum(conc[..., sid].astype(self.dtype), 0.0) * mw
        kappa = self.k0 * (pres / self.p0) ** self.a * (temp / self.t0) ** self.b
        att = kappa * rho
        att = jnp.broadcast_to(att[None], (nwave,) + att.shape)
        return att[..., None]
