"""Chandrasekhar H-function: exact semi-infinite isotropic-scattering
solutions.

A deterministic analytic anchor, independent of both the repo's solver
and the MC oracle: the H-function for isotropic scattering with albedo
``w0`` satisfies the nonlinear integral identity

    1/H(mu) = sqrt(1 - w0) + (w0/2) * int_0^1 mu' H(mu') / (mu + mu') dmu'

(Chandrasekhar, *Radiative Transfer*, ch. V — the standard stable
fixed-point form).  From H, two closed-form observables of a
semi-infinite atmosphere under a collimated beam at mu0:

* plane (directional-hemispherical) albedo: A(mu0) = 1 - sqrt(1-w0) H(mu0)
* emergent radiance: I(mu) = (w0/4) (F/pi-normalized) mu0/(mu+mu0) H(mu) H(mu0)

The solver under test approximates "semi-infinite" with a very thick
layer (tau ~ 64), which is exact to below f64 tolerance for w0 <= 0.995.
"""

from __future__ import annotations

import numpy as np


def h_function(w0: float, mu, n_quad: int = 256, iters: int = 200):
    """H(mu) for isotropic scattering, single-scattering albedo w0."""
    x, w = np.polynomial.legendre.leggauss(n_quad)
    x = 0.5 * (x + 1.0)          # nodes on (0, 1)
    w = 0.5 * w
    H = np.ones_like(x)
    s = np.sqrt(max(1.0 - w0, 0.0))
    for _ in range(iters):
        # 1/H(x_i) = s + (w0/2) sum_j w_j x_j H(x_j) / (x_i + x_j)
        integ = (w * x * H)[None, :] / (x[:, None] + x[None, :])
        H = 1.0 / (s + 0.5 * w0 * integ.sum(axis=1))
    mu = np.atleast_1d(np.asarray(mu, np.float64))
    integ = (w * x * H)[None, :] / (mu[:, None] + x[None, :])
    return 1.0 / (s + 0.5 * w0 * integ.sum(axis=1))


def plane_albedo(w0: float, mu0: float) -> float:
    """Exact plane albedo of a semi-infinite isotropic atmosphere."""
    return float(1.0 - np.sqrt(1.0 - w0) * h_function(w0, [mu0])[0])
