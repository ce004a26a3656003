"""Discrete-ordinates core: batched homogeneous/particular solutions + BVP.

From-scratch TPU-native replacement for the cdisort 2.1.3 compute engine the
reference delegates to (SURVEY.md section 2.3 item 1; used via pydisort at
``/root/reference/src/radiation/radiation_band.cpp:57-70`` and
``examples/amars_sw.cpp:216,280``).  Nothing here is a translation: cdisort
runs a scalar C solve per (wave, col); this module expresses the *entire
batch* of independent column problems as one XLA program:

* per-layer reduced eigenproblem  -> symmetrized product of two N x N
  symmetric matrices, solved with a batched fixed-schedule Jacobi sweep
  (see ``jacobi.py``) — fully parallel over (wave, col, layer);
* beam particular solution        -> evaluated in the eigenbasis with
  resonance-clamped denominators (no extra LU);
* thermal particular solution     -> two batched N x N linear solves;
* layer-coupling boundary-value problem -> block-tridiagonal Thomas
  elimination as a ``lax.scan`` over layers, batched over (wave, col),
  with DISORT's scaled-exponential representation (every exponential
  decays, no overflow for thick layers).

Notation (tau increases downward, mu in (0,1), I+ up / I- down):

    mu dI+/dtau = I+ - (w0/2) sum_j w_j [p(mu_i,mu_j) I+_j + p(mu_i,-mu_j) I-_j] - Q+
   -mu dI-/dtau = I- - (w0/2) sum_j w_j [p(mu_i,-mu_j) I+_j + p(mu_i,mu_j) I-_j] - Q-

Within layer n the general solution is the scaled expansion

    I+-(tau) = sum_k  a_k g+-_k exp(-lam_k (tau - tau_n))
             + sum_k  b_k g-+_k exp(-lam_k (tau_{n+1} - tau))
             + Z+- exp(-tau/mu0) + Y0+- + Y1 (tau - tau_n)

All arrays carry leading batch dims ``(..., nlyr)`` / ``(..., nlyr, N)`` etc.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .jacobi import jacobi_eigh
from .linsolve import lu_solve
from .legendre import lepoly, lepoly_static
from .quadrature import gauss_half_range

_HI = lax.Precision.HIGHEST


def _mm(a, b):
    """Batched matmul at highest available precision."""
    return jnp.einsum("...ij,...jk->...ik", a, b, precision=_HI)


def _mv(a, v):
    return jnp.einsum("...ij,...j->...i", a, v, precision=_HI)


class LayerSolution(NamedTuple):
    """Per-layer homogeneous eigenstructure (batch dims ..., nlyr leading)."""

    lam: jnp.ndarray   # (..., L, N) positive eigenvalues
    gp: jnp.ndarray    # (..., L, N, N) columns: upward components of +lam modes
    gm: jnp.ndarray    # (..., L, N, N) columns: downward components of +lam modes
    expd: jnp.ndarray  # (..., L, N) exp(-lam * dtau)


class StaticAngles(NamedTuple):
    """Compile-time quadrature / Legendre constants for one azimuthal mode."""

    mu: np.ndarray       # (N,)
    w: np.ndarray        # (N,)
    lam_tables: np.ndarray  # (nmom+1, N) normalized assoc. Legendre at nodes
    parity: np.ndarray   # (nmom+1,) (-1)^(l-m)
    m: int
    nstr: int


def make_static_angles(nstr: int, nmom: int, m: int) -> StaticAngles:
    mu, w = gauss_half_range(nstr)
    lmax = max(nmom, nstr - 1)
    lam_tab = lepoly_static(mu, m, lmax)      # (lmax+1, N)
    ls = np.arange(lmax + 1)
    parity = np.where((ls - m) % 2 == 0, 1.0, -1.0)
    return StaticAngles(mu, w, lam_tab, parity, m, nstr)


def _phase_outer_tables(ang: StaticAngles, dtype):
    """Static tables: (2l+1) Lam_l(mu_i) Lam_l(mu_j) split by parity of l-m."""
    lam = ang.lam_tables                     # (L+1, N)
    ls = np.arange(lam.shape[0])
    outer = (2 * ls + 1)[:, None, None] * lam[:, :, None] * lam[:, None, :]
    even = ((ls - ang.m) % 2 == 0)[:, None, None]
    return (
        jnp.asarray(np.where(even, outer, 0.0), dtype),   # even part
        jnp.asarray(np.where(even, 0.0, outer), dtype),   # odd part
    )


def _moment_coeffs(ssa, pmom, ang: StaticAngles, dtype):
    """g_l coefficients for l = m..lmax (zeros below m), g_0 = 1.

    pmom holds moments g_1..g_nmom (may be zero-width).
    """
    lmax = ang.lam_tables.shape[0] - 1
    batch = ssa.shape
    ones = jnp.ones(batch + (1,), dtype)
    nmom = pmom.shape[-1]
    if nmom >= lmax:
        g = jnp.concatenate([ones, pmom[..., :lmax]], axis=-1)
    else:
        pad = jnp.zeros(batch + (lmax - nmom,), dtype)
        g = jnp.concatenate([ones, pmom, pad], axis=-1)
    if ang.m > 0:
        mask = jnp.asarray(
            (np.arange(lmax + 1) >= ang.m).astype(np.float64), dtype
        )
        g = g * mask
    return g  # (..., lmax+1)


def homogeneous_solution(
    ssa, pmom, dtau, ang: StaticAngles
) -> tuple[LayerSolution, jnp.ndarray, jnp.ndarray]:
    """Eigenstructure of every layer (batched).

    Args:
      ssa:  (..., L) single-scattering albedo (already dithered away from 1).
      pmom: (..., L, nmom) phase moments g_1..g_nmom (delta-M scaled upstream).
      dtau: (..., L) layer optical thickness.
      ang:  static angle tables for this azimuthal mode.

    Returns:
      (LayerSolution, Smat, invS_cols) where ``Smat`` is the matrix of
      s = g+ + g- eigenvectors (columns), needed by the beam particular
      solution in the eigenbasis, and U_mat the (I - A - B) matrix used by
      the thermal particular solution.
    """
    dtype = ssa.dtype
    N = ang.mu.shape[0]
    mu = jnp.asarray(ang.mu, dtype)
    w = jnp.asarray(ang.w, dtype)
    even_tab, odd_tab = _phase_outer_tables(ang, dtype)

    g = _moment_coeffs(ssa, pmom, ang, dtype)            # (..., L, lmax+1)
    half_ssa = 0.5 * ssa[..., None, None]

    # D+ +- D- split by parity: Se = sum_{l-m even}, So = sum_{l-m odd}
    Se = jnp.einsum("...l,lij->...ij", g, even_tab, precision=_HI)
    So = jnp.einsum("...l,lij->...ij", g, odd_tab, precision=_HI)

    sqw = jnp.sqrt(w)
    sqm = jnp.sqrt(mu)
    eye = jnp.eye(N, dtype=dtype)

    # Uhat = M^-1/2 (I - w0 W^1/2 Se W^1/2) M^-1/2   (symmetric, ~SPD)
    # Vhat = M^-1/2 (I - w0 W^1/2 So W^1/2) M^-1/2
    def hat(S):
        core = eye - 2.0 * half_ssa * (sqw[:, None] * S * sqw[None, :])
        return core / (sqm[:, None] * sqm[None, :])

    Uhat = hat(Se)
    Vhat = hat(So)

    # Uhat^1/2 via its own eigendecomposition (robust near w0 -> 1)
    ew, Q = jacobi_eigh(Uhat)
    ew = jnp.maximum(ew, jnp.asarray(1e-12, dtype))
    sq = jnp.sqrt(ew)
    Uh = jnp.einsum("...ik,...k,...jk->...ij", Q, sq, Q, precision=_HI)

    K = _mm(Uh, _mm(Vhat, Uh))                     # symmetric
    lam2, Y = jacobi_eigh(K)
    lam2 = jnp.maximum(lam2, jnp.asarray(1e-12, dtype))
    lam = jnp.sqrt(lam2)

    # d-eigenvectors of (alpha-beta)(alpha+beta): d = M^-1/2 W^-1/2 Uh Y
    X = _mm(Uh, Y)
    D = X / (sqm[:, None] * sqw[:, None])           # (..., N, N) columns d_k

    # s = -(1/lam) M^-1 V d,  V = I - (w0/2)(D+ - D-) W = I - w0 So W
    Vfull = eye - 2.0 * half_ssa * (So * w[None, :])
    S = -_mm(Vfull, D) / (mu[:, None] * lam[..., None, :])

    gp = 0.5 * (S + D)
    gm = 0.5 * (S - D)

    # normalize each mode (pair) to unit max magnitude for conditioning
    scale = jnp.maximum(
        jnp.max(jnp.abs(gp), axis=-2), jnp.max(jnp.abs(gm), axis=-2)
    )
    scale = jnp.maximum(scale, jnp.asarray(1e-30, dtype))[..., None, :]
    gp = gp / scale
    gm = gm / scale

    expd = jnp.exp(-lam * dtau[..., None])

    # U = I - (w0/2)(D+ + D-) W = I - w0 Se W (for thermal particular)
    Ufull = eye - 2.0 * half_ssa * (Se * w[None, :])

    return LayerSolution(lam, gp, gm, expd), Vfull, Ufull


def beam_particular(
    sol: LayerSolution,
    Vfull,
    Ufull,
    ssa,
    pmom,
    fbeam,
    mu0,
    ang: StaticAngles,
):
    """Beam-source particular solution Z+-, in the homogeneous eigenbasis.

    The reduced system is  [V M^-1 U - M/mu0^2] zs = V M^-1 qs - qd/mu0.
    Multiplying by M^-1 gives (M^-1 V M^-1 U - I/mu0^2) zs = rhs', whose
    operator shares the s-eigenvectors of the homogeneous problem:
    M^-1 V M^-1 U = S diag(lam^2) S^-1 with S = (g+ + g-) columns.  Expanding
    zs in S turns the solve into a clamped diagonal division — the classic
    beam/eigenvalue resonance (mu0 -> 1/lam_k) is regularized explicitly
    instead of through LU pivots (cdisort leaves this to SGECO luck).

    Args:
      fbeam, mu0: (...,) batch arrays (no layer axis) — beam flux [W/m^2] and
        cosine of solar zenith.
      ssa/pmom carry the layer axis; returns Z+,Z- of shape (..., L, N).
    """
    dtype = ssa.dtype
    mu = jnp.asarray(ang.mu, dtype)
    g = _moment_coeffs(ssa, pmom, ang, dtype)          # (..., L, lmax+1)
    lmax = ang.lam_tables.shape[0] - 1

    # Lam_l(mu0): traced (mu0 is data); add the layer axis by broadcasting
    lam0 = lepoly(mu0, ang.m, lmax)                    # (lmax+1, ...)
    lam0 = jnp.moveaxis(lam0, 0, -1)                   # (..., lmax+1)
    parity = jnp.asarray(ang.parity, dtype)

    lam_tab = jnp.asarray(ang.lam_tables, dtype)       # (lmax+1, N)
    kappa = (2.0 if ang.m > 0 else 1.0) / (4.0 * jnp.pi)
    # q+- = kappa w0 F0 sum_l (2l+1) g_l Lam_l(+-mu_i) Lam_l(-mu0)
    ls = jnp.asarray(np.arange(lmax + 1), dtype)
    coef = g * ((2 * ls + 1) * parity) * lam0[..., None, :]  # (..., L, lmax+1)
    qp = kappa * jnp.einsum("...l,li->...i", coef, lam_tab, precision=_HI)
    qm = kappa * jnp.einsum(
        "...l,li->...i", coef * parity, lam_tab, precision=_HI
    )
    amp = (ssa * fbeam[..., None])[..., None]          # (..., L, 1)
    qp = qp * amp
    qm = qm * amp
    qs = qp + qm
    qd = qp - qm

    # rhs' = M^-1 V M^-1 qs - M^-1 qd / mu0
    rhs = _mv(Vfull, qs / mu[..., :]) / mu - qd / (mu * mu0[..., None, None])

    # expand in s-eigenbasis: solve S c = rhs, scale by 1/(lam^2 - 1/mu0^2)
    S = sol.gp + sol.gm                                # (..., L, N, N)
    c = lu_solve(S, rhs)
    inv_mu0_sq = 1.0 / (mu0 * mu0)[..., None, None]
    denom = sol.lam**2 - inv_mu0_sq
    eps = jnp.asarray(1e-4 if dtype == jnp.float32 else 1e-9, dtype)
    floor = eps * (sol.lam**2 + inv_mu0_sq)
    denom = jnp.where(jnp.abs(denom) < floor,
                      jnp.where(denom < 0, -floor, floor), denom)
    zs = _mv(S, c / denom)

    # zd = -mu0 M^-1 (U zs - qs)
    zd = -mu0[..., None, None] * (_mv(Ufull, zs) - qs) / mu
    zp = 0.5 * (zs + zd)
    zm = 0.5 * (zs - zd)
    return zp, zm


def thermal_particular(Vfull, Ufull, ssa, b_top, b_slope, ang: StaticAngles):
    """Linear-in-tau thermal emission particular solution (m = 0 only).

    Source (1-w0)(b_top + b_slope * t), t local in-layer optical depth.
    Solving U h = (1-w0) e and V y0d = 2 mu * b_slope h gives

        Y1+- = b_slope h,   Y0+- = b_top h +- y0d / 2.

    Returns (Y0p, Y0m, Y1) each (..., L, N).
    """
    dtype = ssa.dtype
    mu = jnp.asarray(ang.mu, dtype)
    N = mu.shape[0]
    e = jnp.ones(ssa.shape + (N,), dtype)
    h = lu_solve(Ufull, (1.0 - ssa)[..., None] * e)
    y1 = b_slope[..., None] * h
    y0d = lu_solve(Vfull, 2.0 * mu * y1)
    y0p = b_top[..., None] * h + 0.5 * y0d
    y0m = b_top[..., None] * h - 0.5 * y0d
    return y0p, y0m, y1


def solve_bvp(
    sol: LayerSolution,
    ptop_p, ptop_m,      # particular I+/I- at each layer top    (..., L, N)
    pbot_p, pbot_m,      # particular I+/I- at each layer bottom (..., L, N)
    ftop,                # (..., N) downward intensity incident at TOA
    bot_rhs,             # (..., N) bottom-boundary rhs (emission+reflection of
                         #          direct beam and particular, precomputed)
    albedo,              # (...,) Lambertian albedo (0 for m > 0)
    ang: StaticAngles,
):
    """Block-tridiagonal Thomas solve for the layer coefficients (a_n, b_n).

    Row-block n pairs [I- continuity at interface n-1 ; I+ continuity at
    interface n], with the top/bottom boundary conditions taking the borders.
    This pairing keeps every diagonal block nonsingular in both the
    thick-layer (E -> 0) and zero-thickness (E -> 1) limits.

    Returns (a, b): (..., L, N) each.
    """
    dtype = sol.lam.dtype
    L = sol.lam.shape[-2]
    N = ang.mu.shape[0]
    mu = jnp.asarray(ang.mu, dtype)
    w = jnp.asarray(ang.w, dtype)

    gp, gm, E = sol.gp, sol.gm, sol.expd
    Em = E[..., None, :]  # scale columns

    batch = jnp.broadcast_shapes(
        sol.lam.shape[:-2], ftop.shape[:-1], albedo.shape
    )

    def bc(x, shape):
        return jnp.broadcast_to(x, batch + shape)

    # --- assemble block rows (layer axis L kept explicit, then scanned) ---
    # upper half of row n (n>=1): I- continuity at interface n-1
    #   [gm E, gp]_{n-1} x_{n-1} - [gm, gp E]_n x_n = Pt-_n - Pb-_{n-1}
    # lower half of row n (n<=L-2): I+ continuity at interface n
    #   [gp E, gm]_n x_n - [gp, gm E]_{n+1} x_{n+1} = Pt+_{n+1} - Pb+_n
    A_up = jnp.concatenate([gm * Em, gp], axis=-1)              # (...,L,N,2N)
    B_up = -jnp.concatenate([gm, gp * Em], axis=-1)
    B_lo = jnp.concatenate([gp * Em, gm], axis=-1)
    C_lo = -jnp.concatenate([gp, gm * Em], axis=-1)

    # row 0 upper half: top BC  I-(0) = ftop:  gm a0 + gp E b0
    B_up0 = jnp.concatenate([gm[..., 0, :, :], gp[..., 0, :, :] * Em[..., 0, :, :]],
                            axis=-1)
    # row L-1 lower half: bottom BC with Lambertian reflection
    #   K+ = gp - 2 alb 1 (w mu)^T gm ; K- = gm - 2 alb 1 (w mu)^T gp
    wmu = w * mu
    alb2 = 2.0 * albedo[..., None, None]
    gpL = gp[..., L - 1, :, :]
    gmL = gm[..., L - 1, :, :]
    refl_p = jnp.einsum("j,...jk->...k", wmu, gmL, precision=_HI)
    refl_m = jnp.einsum("j,...jk->...k", wmu, gpL, precision=_HI)
    Kp = gpL - alb2 * refl_p[..., None, :]
    Km = gmL - alb2 * refl_m[..., None, :]
    B_loL = jnp.concatenate([Kp * Em[..., L - 1, :, :], Km], axis=-1)

    # stitch per-layer blocks:
    B_up_all = jnp.concatenate(
        [bc(B_up0, (N, 2 * N))[..., None, :, :], B_up[..., 1:, :, :]], axis=-3
    )
    B_lo_all = jnp.concatenate(
        [B_lo[..., : L - 1, :, :], bc(B_loL, (N, 2 * N))[..., None, :, :]],
        axis=-3,
    )
    Bblk = jnp.concatenate([B_up_all, B_lo_all], axis=-2)       # (...,L,2N,2N)

    A_up_all = jnp.concatenate(
        [jnp.zeros(batch + (1, N, 2 * N), dtype), A_up[..., : L - 1, :, :]],
        axis=-3,
    )
    Ablk = jnp.concatenate([A_up_all, jnp.zeros_like(A_up_all)], axis=-2)

    C_lo_all = jnp.concatenate([C_lo[..., 1:, :, :],
                                jnp.zeros(batch + (1, N, 2 * N), dtype)], axis=-3)
    Cblk = jnp.concatenate([jnp.zeros_like(C_lo_all), C_lo_all], axis=-2)

    # rhs
    dPm = ptop_m - jnp.concatenate(
        [jnp.zeros(batch + (1, N), dtype), pbot_m[..., : L - 1, :]], axis=-2
    )  # row n upper: Pt-_n - Pb-_{n-1}; row 0 handled below
    d_up = jnp.concatenate(
        [bc(ftop - ptop_m[..., 0, :], (N,))[..., None, :], dPm[..., 1:, :]],
        axis=-2,
    )
    dPp = jnp.concatenate(
        [ptop_p[..., 1:, :] - pbot_p[..., : L - 1, :],
         bc(bot_rhs, (N,))[..., None, :]],
        axis=-2,
    )
    dblk = jnp.concatenate([d_up, dPp], axis=-1)               # (...,L,2N)

    # --- block-tridiagonal Thomas scan ---
    def fwd(carry, blk):
        Wprev, gprev = carry
        Ab, Bb, Cb, db = blk
        Mn = Bb - _mm(Ab, Wprev)
        rhs_cat = jnp.concatenate([Cb, (db - _mv(Ab, gprev))[..., None]], axis=-1)
        sol_cat = lu_solve(Mn, rhs_cat)
        Wn = sol_cat[..., :-1]
        gn = sol_cat[..., -1]
        return (Wn, gn), (Wn, gn)

    # move layer axis to scan position 0
    def l2f(x):
        return jnp.moveaxis(x, -3, 0)

    Ab = l2f(Ablk)
    Bb = l2f(Bblk)
    Cb = l2f(Cblk)
    db = jnp.moveaxis(dblk, -2, 0)

    W0 = jnp.zeros(batch + (2 * N, 2 * N), dtype)
    g0 = jnp.zeros(batch + (2 * N,), dtype)
    (_, _), (Ws, gs) = lax.scan(fwd, (W0, g0), (Ab, Bb, Cb, db))

    def bwd(x_next, blk):
        Wn, gn = blk
        xn = gn - _mv(Wn, x_next)
        return xn, xn

    xL = gs[-1]
    _, xs_rev = lax.scan(bwd, xL, (Ws[:-1], gs[:-1]), reverse=True)
    xs = jnp.concatenate([xs_rev, xL[None]], axis=0)           # (L, ..., 2N)
    xs = jnp.moveaxis(xs, 0, -2)                               # (..., L, 2N)
    return xs[..., :N], xs[..., N:]
