"""Independent plane-parallel RT oracle: source iteration on a fine tau grid.

Pure numpy float64, shares NO code with the pyharp_tpu DISORT implementation
(different algorithm entirely: short-characteristics formal solution + Picard
iteration on the scattering source, vs eigendecomposition + boundary-value
solve).  Used to validate the TPU solver:

* run with the *same* double-Gauss quadrature as the solver under test, both
  discretize the identical ODE system -> agreement to O(dtau_sub^2);
* run with a much finer quadrature -> physics/convergence checks.

Supports: beam source (fbeam, mu0), thermal linear-in-tau Planck emission,
Lambertian surface (albedo, btemp emission), isotropic top illumination
(fisot), arbitrary phase-moment sets per layer.
"""

from __future__ import annotations

import numpy as np
from numpy.polynomial.legendre import leggauss, legval


def double_gauss(n_half: int):
    x, w = leggauss(n_half)
    mu = 0.5 * (x + 1.0)
    w = 0.5 * w
    order = np.argsort(mu)
    return mu[order], w[order]


def phase_matrix(moments, mu_i, mu_j):
    """p(mu_i, mu_j) azimuthally averaged: sum_l (2l+1) g_l P_l(mu_i) P_l(mu_j).

    moments: (L+1,) full moment set starting with g_0 = 1.
    """
    lmax = len(moments) - 1
    P_i = np.stack([legval(mu_i, np.eye(lmax + 1)[l]) for l in range(lmax + 1)])
    P_j = np.stack([legval(mu_j, np.eye(lmax + 1)[l]) for l in range(lmax + 1)])
    coef = (2 * np.arange(lmax + 1) + 1) * np.asarray(moments)
    return np.einsum("l,li,lj->ij", coef, P_i, P_j)


def _expint_weights(delta):
    """Linear-source short-characteristic weights.

    int_0^d S(t) e^{-(d-t)} dt with S linear from S0 (upstream) to S1 (local):
    returns (w0, w1) so the integral = w0*S0 + w1*S1.
    """
    d = delta
    if d < 1e-4:
        # series to O(d^3)
        w0 = d / 2 - d * d / 3 + d**3 / 8
        w1 = d / 2 - d * d / 6 + d**3 / 24
        return w0, w1
    e = np.exp(-d)
    f = (1.0 - (1.0 + d) * e) / d      # int (u/d) e^-u du over [0, d]
    w1 = (1.0 - e) - f
    w0 = f
    return w0, w1


def solve_sos(
    dtau,                 # (nlyr,) layer optical thickness, TOP-DOWN
    ssa,                  # (nlyr,)
    moments,              # (nlyr, L+1) incl. g_0 = 1
    n_half=4,             # quadrature points per hemisphere
    fbeam=0.0, mu0=1.0,
    albedo=0.0,
    fisot=0.0,
    # thermal: per-layer linear-in-tau Planck B(t) = b_top + slope * t_local
    b_top=None, b_slope=None, b_surface=0.0, b_toptemis=0.0,
    nsub=64,              # substeps per layer
    tol=1e-12, max_iter=5000,
):
    """Returns dict with level fluxes (flup, rfldn, rfldir) at layer
    boundaries (nlyr+1, top-down) and the converged intensity field."""
    nlyr = len(dtau)
    mu, w = double_gauss(n_half)
    nq = len(mu)

    # fine grid: layer n subdivided into nsub equal substeps
    sub_d = np.repeat(np.asarray(dtau) / nsub, nsub)   # (nlyr*nsub,)
    npts = len(sub_d) + 1
    taucum = np.concatenate([[0.0], np.cumsum(sub_d)])
    lyr_of_pt = np.minimum(
        np.searchsorted(np.concatenate([[0.0], np.cumsum(dtau)]), taucum,
                        side="right") - 1, nlyr - 1)
    # local tau within the layer for each grid point
    lyr_tau0 = np.concatenate([[0.0], np.cumsum(dtau)])[lyr_of_pt]
    t_local = taucum - lyr_tau0

    ssa_pt = np.asarray(ssa)[lyr_of_pt]
    # phase matrices per layer
    Ppp = np.stack([phase_matrix(m, mu, mu) for m in moments])     # (nlyr,nq,nq)
    Ppm = np.stack([phase_matrix(m, mu, -mu) for m in moments])
    p_beam_p = np.stack([  # p(+mu_i, -mu0)
        phase_matrix(m, mu, np.array([-mu0]))[:, 0] for m in moments])
    p_beam_m = np.stack([
        phase_matrix(m, -mu, np.array([-mu0]))[:, 0] for m in moments])

    if b_top is None:
        B_pt = np.zeros(npts)
    else:
        B_pt = np.asarray(b_top)[lyr_of_pt] + np.asarray(b_slope)[lyr_of_pt] * t_local

    beam_pt = fbeam * np.exp(-taucum / mu0) if fbeam > 0 else np.zeros(npts)

    Iup = np.zeros((npts, nq))
    Idn = np.zeros((npts, nq))

    # precompute short-characteristic attenuation + source weights per substep
    D = sub_d[:, None] / mu[None, :]            # (npts-1, nq)
    E = np.exp(-D)
    W0 = np.empty_like(D)
    W1 = np.empty_like(D)
    for i in range(D.shape[0]):
        for j in range(nq):
            W0[i, j], W1[i, j] = _expint_weights(D[i, j])

    def source(Iup, Idn):
        """S+-(pt, mu_j)."""
        lp = lyr_of_pt
        sc_up = 0.5 * ssa_pt[:, None] * (
            np.einsum("pjk,pk->pj", Ppp[lp], Iup * w)
            + np.einsum("pjk,pk->pj", Ppm[lp], Idn * w)
        )
        sc_dn = 0.5 * ssa_pt[:, None] * (
            np.einsum("pjk,pk->pj", Ppm[lp], Iup * w)
            + np.einsum("pjk,pk->pj", Ppp[lp], Idn * w)
        )
        if fbeam > 0:
            amp = ssa_pt * beam_pt / (4 * np.pi)
            sc_up = sc_up + amp[:, None] * p_beam_p[lp]
            sc_dn = sc_dn + amp[:, None] * p_beam_m[lp]
        if b_top is not None:
            em = (1.0 - ssa_pt) * B_pt
            sc_up = sc_up + em[:, None]
            sc_dn = sc_dn + em[:, None]
        return sc_up, sc_dn

    for it in range(max_iter):
        Sup, Sdn = source(Iup, Idn)
        Iup_new = np.zeros_like(Iup)
        Idn_new = np.zeros_like(Idn)

        # top boundary: downward intensity
        Idn_new[0, :] = fisot + b_toptemis

        # sweep down
        for i in range(1, npts):
            Idn_new[i] = (Idn_new[i - 1] * E[i - 1]
                          + W0[i - 1] * Sdn[i - 1] + W1[i - 1] * Sdn[i])

        # bottom boundary: Lambertian reflection + emission
        dn_diff_flux = 2 * np.pi * np.sum(w * mu * Idn_new[-1])
        dn_dir_flux = mu0 * fbeam * np.exp(-taucum[-1] / mu0) if fbeam > 0 else 0.0
        Iup_new[-1, :] = (albedo / np.pi * (dn_diff_flux + dn_dir_flux)
                          + (1.0 - albedo) * b_surface)

        # sweep up
        for i in range(npts - 2, -1, -1):
            Iup_new[i] = (Iup_new[i + 1] * E[i]
                          + W0[i] * Sup[i + 1] + W1[i] * Sup[i])

        change = max(np.max(np.abs(Iup_new - Iup)), np.max(np.abs(Idn_new - Idn)))
        scale = max(np.max(np.abs(Iup_new)), np.max(np.abs(Idn_new)), 1e-30)
        Iup, Idn = Iup_new, Idn_new
        if change <= tol * scale:
            break

    # fluxes at the original layer boundaries
    lvl_idx = np.arange(0, npts, nsub)
    flup = 2 * np.pi * np.sum(w * mu * Iup[lvl_idx], axis=1)
    rfldn = 2 * np.pi * np.sum(w * mu * Idn[lvl_idx], axis=1)
    rfldir = mu0 * fbeam * np.exp(-taucum[lvl_idx] / mu0) if fbeam > 0 else np.zeros(nlyr + 1)

    return dict(flup=flup, rfldn=rfldn, rfldir=rfldir,
                iterations=it + 1, Iup=Iup[lvl_idx], Idn=Idn[lvl_idx], mu=mu, w=w)
