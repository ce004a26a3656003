"""Exact discrete-ordinates oracle: dense multi-layer BVP in numpy float64.

Solves the same angular-discretized ODE system as the solver under test, but
through an entirely independent pipeline: full 2N x 2N *nonsymmetric*
eigendecomposition per layer (``numpy.linalg.eig``), the beam particular
solution from a direct 2N linear solve, the thermal particular from
``Msys^-1``, and one dense global (2N L) x (2N L) boundary-value matrix solved
with LAPACK partial-pivot LU.  Agreement with the pyharp_tpu solver
(symmetrized reduced eigenproblem + eigenbasis particular + block-tridiagonal
Thomas) is then limited only by round-off.

Per-layer basis uses the same overflow-safe scaling (decaying exponentials
anchored at layer top/bottom), which is a representation choice, not an
algorithm: coefficients differ but the solution is identical.
"""

from __future__ import annotations

import numpy as np
from numpy.polynomial.legendre import legval

from .sos import double_gauss, phase_matrix


def phase_matrix_m(moments, mu_i, mu_j, m):
    """Azimuthal mode-m phase matrix via normalized assoc. Legendre."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from pyharp_tpu.rt.disort.legendre import lepoly_static

    lmax = len(moments) - 1
    lam_i = lepoly_static(np.atleast_1d(mu_i), m, lmax)
    lam_j = lepoly_static(np.atleast_1d(mu_j), m, lmax)
    coef = (2 * np.arange(lmax + 1) + 1) * np.asarray(moments)
    return np.einsum("l,li,lj->ij", coef, lam_i, lam_j)


def solve_dense(
    dtau, ssa, moments,       # top-down layers: (L,), (L,), (L, nmom+1)
    n_half=4,
    fbeam=0.0, mu0=0.5,
    albedo=0.0, fisot=0.0,
    b_top=None, b_slope=None, b_surface=0.0, b_toptemis=0.0,
    mode=0,
    utaus=(),
):
    nlyr = len(dtau)
    mu, w = double_gauss(n_half)
    N = len(mu)
    M = np.diag(mu)
    Minv = np.diag(1.0 / mu)
    I = np.eye(N)
    taucum = np.concatenate([[0.0], np.cumsum(dtau)])

    # per-layer structures
    eigvals = []; eigvecs = []; Zs = []; Y0s = []; Y1s = []
    def pmat(mom, a_, b_):
        if mode == 0:
            return phase_matrix(mom, a_, b_)
        return phase_matrix_m(mom, a_, b_, mode)

    for n in range(nlyr):
        m = np.asarray(moments[n])
        Pp = pmat(m, mu, mu)
        Pm = pmat(m, mu, -mu)
        A = ssa[n] / 2 * Pp * w[None, :]
        B = ssa[n] / 2 * Pm * w[None, :]
        Msys = np.block([[Minv @ (I - A), -Minv @ B],
                         [Minv @ B, -Minv @ (I - A)]])
        lam, V = np.linalg.eig(Msys)
        lam = lam.real; V = V.real
        eigvals.append(lam); eigvecs.append(V)

        if fbeam > 0:
            scale = ssa[n] * fbeam / (4 * np.pi) * (2.0 if mode > 0 else 1.0)
            qp = scale * pmat(m, mu, np.array([-mu0]))[:, 0]
            qm = scale * pmat(m, -mu, np.array([-mu0]))[:, 0]
            qvec = np.concatenate([Minv @ qp, -Minv @ qm])
            Z = np.linalg.solve(-np.eye(2 * N) / mu0 - Msys, -qvec)
        else:
            Z = np.zeros(2 * N)
        Zs.append(Z)

        if b_top is not None:
            e2 = np.concatenate([Minv @ np.ones(N), -Minv @ np.ones(N)])
            q1 = (1 - ssa[n]) * b_slope[n] * e2
            q0 = (1 - ssa[n]) * b_top[n] * e2
            Y1 = np.linalg.solve(Msys, q1)
            Y0 = np.linalg.solve(Msys, Y1 + q0)
        else:
            Y0 = np.zeros(2 * N); Y1 = np.zeros(2 * N)
        Y0s.append(Y0); Y1s.append(Y1)

    def particular(n, t_local):
        """Particular solution vector at local optical depth t in layer n."""
        tau = taucum[n] + t_local
        out = Y0s[n] + Y1s[n] * t_local
        if fbeam > 0:
            out = out + Zs[n] * np.exp(-tau / mu0)
        return out

    def basis(n, t_local):
        """Columns: scaled homogeneous basis at local depth t in layer n."""
        lam = eigvals[n]
        d = dtau[n]
        # decaying scaling: lam<0 anchored at top, lam>0 anchored at bottom
        expo = np.where(lam < 0, lam * t_local, lam * (t_local - d))
        return eigvecs[n] * np.exp(expo)[None, :]

    # global dense BVP: unknowns c_n (2N per layer)
    nun = 2 * N * nlyr
    Amat = np.zeros((nun, nun))
    rhs = np.zeros(nun)
    row = 0
    # top: Im(0) = fisot + temis B(ttemp)
    Btop0 = basis(0, 0.0)
    Amat[row:row + N, 0:2 * N] = Btop0[N:, :]
    rhs[row:row + N] = fisot + b_toptemis - particular(0, 0.0)[N:]
    row += N
    # interfaces
    for n in range(nlyr - 1):
        Bb = basis(n, dtau[n])
        Bt = basis(n + 1, 0.0)
        dP = particular(n + 1, 0.0) - particular(n, dtau[n])
        Amat[row:row + 2 * N, 2 * N * n:2 * N * (n + 1)] = Bb
        Amat[row:row + 2 * N, 2 * N * (n + 1):2 * N * (n + 2)] = -Bt
        rhs[row:row + 2 * N] = dP
        row += 2 * N
    # bottom: Ip(tauL) = alb/pi (mu0F0 e^-tauL/mu0 + 2pi sum w mu Im) + (1-alb) Bsurf
    Bb = basis(nlyr - 1, dtau[nlyr - 1])
    Pb = particular(nlyr - 1, dtau[nlyr - 1])
    wmu = w * mu
    Amat[row:row + N, 2 * N * (nlyr - 1):] = (
        Bb[:N, :] - 2 * albedo * wmu[None, :] @ Bb[N:, :]
    )
    dir_refl = albedo / np.pi * mu0 * fbeam * np.exp(-taucum[-1] / mu0) if fbeam > 0 else 0.0
    rhs[row:row + N] = (dir_refl + (1 - albedo) * b_surface
                        + 2 * albedo * wmu @ Pb[N:] - Pb[:N])
    c = np.linalg.solve(Amat, rhs)

    # fluxes at levels
    flup = np.zeros(nlyr + 1)
    rfldn = np.zeros(nlyr + 1)
    for lvl in range(nlyr + 1):
        n = min(lvl, nlyr - 1)
        t = 0.0 if lvl < nlyr else dtau[nlyr - 1]
        u = basis(n, t) @ c[2 * N * n:2 * N * (n + 1)] + particular(n, t)
        flup[lvl] = 2 * np.pi * np.sum(wmu * u[:N])
        rfldn[lvl] = 2 * np.pi * np.sum(wmu * u[N:])
    rfldir = (mu0 * fbeam * np.exp(-taucum / mu0)) if fbeam > 0 else np.zeros(nlyr + 1)

    Iup = np.zeros((nlyr + 1, N))
    Idn = np.zeros((nlyr + 1, N))
    for lvl in range(nlyr + 1):
        n = min(lvl, nlyr - 1)
        t = 0.0 if lvl < nlyr else dtau[nlyr - 1]
        u = basis(n, t) @ c[2 * N * n:2 * N * (n + 1)] + particular(n, t)
        Iup[lvl] = u[:N]
        Idn[lvl] = u[N:]

    # exact intensities at arbitrary cumulative depths (USRTAU oracle)
    Iup_t = np.zeros((len(utaus), N))
    Idn_t = np.zeros((len(utaus), N))
    for q, t in enumerate(utaus):
        n = int(np.clip(np.searchsorted(taucum, t, side="right") - 1,
                        0, nlyr - 1))
        tl = min(max(t - taucum[n], 0.0), dtau[n])
        u = basis(n, tl) @ c[2 * N * n:2 * N * (n + 1)] + particular(n, tl)
        Iup_t[q] = u[:N]
        Idn_t[q] = u[N:]
    return dict(flup=flup, rfldn=rfldn, rfldir=rfldir, Iup=Iup, Idn=Idn,
                Iup_t=Iup_t, Idn_t=Idn_t, mu=mu, w=w)
