"""Normalized associated Legendre functions for the azimuthal expansion.

The discrete-ordinates method expands the phase function per azimuthal mode m:

    p^m(mu, mu') = sum_{l=m}^{nmom} (2l+1) g_l Lam_l^m(mu) Lam_l^m(mu')

with Lam_l^m(mu) = sqrt((l-m)!/(l+m)!) P_l^m(mu) (cdisort's LEPOLY
equivalent; the Condon-Shortley phase cancels in the product and is omitted).

Two entry points:

* :func:`lepoly_static` — host-side numpy for quadrature nodes (compile-time
  constants);
* :func:`lepoly` — traced jnp version for data-dependent angles (the solar
  cosine ``mu0`` is a runtime tensor), a static-length recurrence over l that
  XLA unrolls into pure VPU ops.

Parity identity used throughout: Lam_l^m(-mu) = (-1)^(l-m) Lam_l^m(mu).
"""

from __future__ import annotations

import numpy as np


def _lepoly_impl(np_, mu, m: int, lmax: int):
    """Lam_l^m(mu) for l = 0..lmax; zeros for l < m.

    Returns an array of shape ``(lmax+1,) + mu.shape``.
    """
    out = []
    s = np_.sqrt(np_.maximum(1.0 - mu * mu, 0.0)) if m > 0 else None

    # seed: Lam_m^m = sqrt((2m-1)!!/(2m)!!) (1-mu^2)^(m/2)
    coef = 1.0
    for k in range(1, m + 1):
        coef *= (2 * k - 1) / (2 * k)
    pmm = np_.sqrt(coef) * (s**m) if m > 0 else np_.ones_like(mu)

    for l in range(0, lmax + 1):
        if l < m:
            out.append(np_.zeros_like(mu))
        elif l == m:
            out.append(pmm)
        elif l == m + 1:
            # sqrt((l-m)(l+m)) Lam_l = (2l-1) mu Lam_{l-1} - ... (two-term seed)
            out.append(np_.sqrt(2.0 * m + 1.0) * mu * pmm)
        else:
            a = np_.sqrt((l - m) * (l + m))
            b = np_.sqrt((l - 1 - m) * (l - 1 + m))
            out.append(((2 * l - 1) * mu * out[l - 1] - b * out[l - 2]) / a)
    return np_.stack(out, axis=0)


def lepoly_static(mu: np.ndarray, m: int, lmax: int) -> np.ndarray:
    """Host-side float64 evaluation (for static quadrature nodes)."""
    return _lepoly_impl(np, np.asarray(mu, np.float64), m, lmax)


def lepoly(mu, m: int, lmax: int):
    """Traced evaluation for runtime angles (e.g. mu0 boundary tensors)."""
    import jax.numpy as jnp

    return _lepoly_impl(jnp, mu, m, lmax)
