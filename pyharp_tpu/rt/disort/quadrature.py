"""Double-Gauss angular quadrature.

The discrete-ordinates engine (the reference delegates this to the external
cdisort 2.1.3 C library, see SURVEY.md section 2.3 item 1) discretizes each
hemisphere with an N = nstr/2 point Gauss-Legendre rule mapped to (0, 1)
("double-Gauss", Sykes 1951), so that upward/downward fluxes
``2 pi sum_i w_i mu_i I(+-mu_i)`` integrate half-range polynomials exactly.

All nodes/weights are static compile-time constants (numpy float64, cast at
trace time), never computed on device.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def gauss_half_range(nstr: int) -> tuple[np.ndarray, np.ndarray]:
    """N = nstr/2 Gauss-Legendre nodes/weights on (0, 1).

    Returns ``(mu, w)`` ascending, with ``sum(w) == 1`` so that
    ``int_0^1 f(mu) dmu ~= sum_i w_i f(mu_i)``.
    """
    if nstr < 2 or nstr % 2:
        raise ValueError(f"nstr must be even and >= 2, got {nstr}")
    n = nstr // 2
    x, w = np.polynomial.legendre.leggauss(n)
    mu = 0.5 * (x + 1.0)
    w = 0.5 * w
    order = np.argsort(mu)
    return mu[order], w[order]
