"""Spherical flux correction.

Parity with ``/root/reference/src/utils/spherical_flux_correction.cpp:3-18``
(algorithm note at ``spherical_flux_correction.hpp:5-11``): rescale
plane-parallel fluxes so heating rates are conserved in spherical geometry,
by the downward sweep

    volh = (F[iu] - F[i]) / dx1f * vol[i]
    F[i] <- (F[i+1] * area[i+1] - volh) / area[i]

TPU-native: expressed as a ``lax.scan`` over the radial axis (the sweep is
inherently sequential), batched over all leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax
from jax import Array


def spherical_flux_correction(flx: Array, x1f: Array, area: Array, vol: Array) -> Array:
    """Args mirror the reference: ``flx (..., nx1)`` level fluxes, ``x1f``
    radial coordinates ``(nx1,)``, ``area (..., nx1)``, ``vol (..., nx1)``
    (volume defined per cell; the last entry is unused)."""
    nx1 = flx.shape[-1]
    dx1f = x1f[1:] - x1f[:-1]

    def step(carry, i):
        # carry: (original F[i+1], corrected F[i+1]) — the reference updates
        # in place, so volh uses original fluxes while the rescale chains the
        # corrected ones (spherical_flux_correction.cpp:7-15)
        orig_prev, new_prev = carry
        f_i = jnp.take(flx, i, axis=-1)
        a_i = jnp.take(area, i, axis=-1)
        a_ip1 = jnp.take(area, i + 1, axis=-1)
        v_i = jnp.take(vol, i, axis=-1)
        volh = (orig_prev - f_i) / dx1f[i] * v_i
        new = (new_prev * a_ip1 - volh) / a_i
        return (f_i, new), new

    idx = jnp.arange(nx1 - 2, -1, -1)
    last = jnp.take(flx, nx1 - 1, axis=-1)
    _, news = lax.scan(step, (last, last), idx)
    # news[k] is the corrected flux at index idx[k]; scatter back
    news = jnp.moveaxis(news, 0, -1)[..., ::-1]  # ascending index order 0..nx1-2
    return jnp.concatenate([news, flx[..., -1:]], axis=-1)
