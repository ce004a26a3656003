"""Band-integrated Planck function.

TPU-native equivalent of cdisort's thermal source setup (the reference's
``planck`` flag with per-bin ``wvnmlo/wvnmhi`` integration, SURVEY.md
section 2.3 item 1 and ``examples/amars_lw.cpp:18-38``): the emitted intensity
of each spectral bin is

    B_band(T) = int_{nu1}^{nu2} B_nu(T) dnu      [W / (m^2 sr)]

with nu in cm^-1.  Writing x = c2 nu / T (c2 = h c / k in cm K),

    int_{nu}^{inf} B dnu = (sigma T^4 / pi) * (15/pi^4) * S(x),
    S(x) = sum_{k>=1} e^{-k x} (x^3/k + 3x^2/k^2 + 6x/k^3 + 6/k^4),

and for small x the complementary power series

    int_0^x v^3/(e^v - 1) dv = x^3 (1/3 - x/8 + x^2/60 - x^4/5040
                               + x^6/272160 - x^8/13305600 ...)

is used instead (the exponential sum converges slowly there).  Both branches
are evaluated with static term counts and combined with ``where`` — no
data-dependent control flow under jit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...core import constants

# Stefan-Boltzmann derived from (h, c, kB) so band integrals are internally
# consistent with B_nu to machine precision.  The reference's tabulated
# ``stefanBoltzmann`` (constants.h:15) mixes CODATA vintages and differs from
# sigma(h,c,k) by ~4e-6 relative; we keep that constant for API parity but do
# not use it here.
_SIGMA = (
    2.0 * np.pi**5 * constants.kBoltz**4
    / (15.0 * constants.hPlanck**3 * constants.cLight**2)
)

_XCUT = 1.2          # branch switch point
_NEXP = 30           # exp-series terms: e^{-30*1.2} ~ 2e-16
# Bernoulli series coefficients for int_0^x v^3/(e^v-1) dv / x^3
_POWER_COEFS = (
    (0, 1.0 / 3.0),
    (1, -1.0 / 8.0),
    (2, 1.0 / 60.0),
    (4, -1.0 / 5040.0),
    (6, 1.0 / 272160.0),
    (8, -1.0 / 13305600.0),
    (10, 1.0 / 622702080.0),
)
_PI4_15 = 15.0 / jnp.pi**4


def _upper_integral_scaled(x):
    """(15/pi^4) int_x^inf v^3/(e^v-1) dv, valid for x >= ~1.

    Accumulated term-by-term (static Python loop) rather than materializing a
    ``(..., NEXP)`` axis: a trailing length-30 dim would be lane-padded to
    128 on TPU (4x memory) and the exp recurrence e^{-kx} = e^{-(k-1)x} e^{-x}
    replaces 30 transcendentals with one.
    """
    x2 = x * x
    x3 = x2 * x
    ex = jnp.exp(-x)
    ek = ex
    acc = jnp.zeros_like(x)
    for kk in range(1, _NEXP + 1):
        acc = acc + ek * (x3 / kk + 3 * x2 / (kk * kk)
                          + 6 * x / (kk**3) + 6.0 / (kk**4))
        if kk < _NEXP:
            ek = ek * ex
    return _PI4_15 * acc


def _lower_integral_scaled(x):
    """(15/pi^4) int_0^x v^3/(e^v-1) dv via power series, valid for x <= ~2."""
    acc = jnp.zeros_like(x)
    for p, c in _POWER_COEFS:
        acc = acc + c * x**p
    return _PI4_15 * x**3 * acc


def _cumulative_fraction(x):
    """F(x) = (15/pi^4) int_0^x v^3/(e^v-1) dv, all x >= 0 (static branches)."""
    xs = jnp.clip(x, 0.0, _XCUT)          # safe arg for the power branch
    # upper clamp: beyond x ~ 80 the tail integral underflows to 0 exactly;
    # without it x**3 overflows float32 for extreme c2*nu/T (e.g. T -> 0)
    xl = jnp.clip(x, _XCUT, 80.0)
    lo = _lower_integral_scaled(xs)
    hi = 1.0 - _upper_integral_scaled(xl)
    return jnp.where(x < _XCUT, lo, hi)


def planck_band(temp, wnlo, wnhi):
    """Band-integrated Planck intensity [W / (m^2 sr)].

    Args:
      temp: temperature [K] (any broadcastable shape).
      wnlo, wnhi: band edges [cm^-1], broadcastable against ``temp``.
        ``wnlo == 0`` and ``wnhi == inf`` are allowed.
    """
    temp = jnp.asarray(temp)
    t = jnp.maximum(temp, 1e-10)
    c2 = jnp.asarray(constants.c2_cmK, t.dtype)
    x1 = c2 * wnlo / t
    x2 = c2 * jnp.minimum(wnhi, 1e30) / t
    frac = _cumulative_fraction(x2) - _cumulative_fraction(x1)
    frac = jnp.where(jnp.isinf(jnp.asarray(wnhi, t.dtype)),
                     1.0 - _cumulative_fraction(x1), frac)
    return (_SIGMA / jnp.pi) * t**4 * frac


def planck_total(temp):
    """sigma T^4 / pi — full-spectrum Planck intensity."""
    return (_SIGMA / jnp.pi) * jnp.asarray(temp) ** 4
