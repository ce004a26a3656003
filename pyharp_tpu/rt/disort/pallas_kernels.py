"""Pallas TPU kernels for the DISORT hot path.

The pure-XLA solver (``solver.py``) is correct on every backend but
HBM-bound on TPU: the Jacobi eigensolve carries 32 full ``(L, B)``
component arrays through HBM on every ``fori_loop`` sweep (~7 GB/sweep at
production sizes) and the BVP scan streams its whole carry per layer.  The
kernels here run the same math with all intermediate state resident in
VMEM/vector registers, so HBM traffic collapses to the kernel inputs and
outputs — the speed-of-light for this problem (SURVEY.md section 7, "hard
parts" 1-2).

Layout contract (matches ``solver.py``): batch-last ``(L, B)`` per-layer
scalars, with tiny matrix dims fully scalarized as Python lists of
``(TL, TB)`` tiles inside the kernel.  The grid is ``(L/TL, B/TB)`` —
every block is independent (the eigensolve is embarrassingly parallel over
layers and columns).  Out-of-range tail blocks read zero-padded inputs
(``ssa = dtau = 0`` is a well-defined vacuum layer) and their writes are
dropped by Pallas.

All kernels are f32 (the TPU compute dtype); callers fall back to the XLA
path for f64 validation runs and non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .solver import StaticAngles, _phase_outer_tables


# ---------------------------------------------------------------------------
# scalarized tiny-matrix helpers (lists of (TL, TB) tiles)
# ---------------------------------------------------------------------------

def _chol(A, n, floor=1e-12):
    """Scalarized Cholesky: A list-of-lists -> lower L list-of-lists."""
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        d = A[j][j]
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(d, floor))
        L[j][j] = d
        inv = 1.0 / d
        for i in range(j + 1, n):
            v = A[i][j]
            for k in range(j):
                v = v - L[i][k] * L[j][k]
            L[i][j] = v * inv
    return L


def _addn(terms, like):
    """Sum skipping structural (None) zeros."""
    terms = [t for t in terms if t is not None]
    if not terms:
        return jnp.zeros_like(like)
    return functools.reduce(lambda x, y: x + y, terms)


def _mul(a, b):
    return None if (a is None or b is None) else a * b


def _sds(shape, dtype, like):
    """ShapeDtypeStruct carrying the varying-manual-axes of ``like``.

    Under ``shard_map`` with the replication checker on (check_vma, the
    default since JAX 0.9), ``pallas_call`` requires its out_shape structs
    to declare how outputs vary across mesh axes; kernel outputs vary
    exactly like their batch inputs.  Outside shard_map the vma set is
    empty and this is a plain ShapeDtypeStruct.
    """
    try:
        vma = jax.typeof(like).vma
    except (AttributeError, TypeError):
        vma = None
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)



def _matmul(A, B, n):
    """Matrix product treating None entries as structural zeros."""
    like = next(x for row in A for x in row if x is not None)
    return [[_addn([_mul(A[i][k], B[k][j]) for k in range(n)], like)
             for j in range(n)] for i in range(n)]


def _lu_solve_cols(A, bs, n):
    """Scalarized LU with bubble pivoting: solve A x = b for each b in bs.

    A: list-of-lists (n x n); bs: list of rhs vectors (each a list of n
    tiles).  Returns the solutions in the same structure.  Mirrors
    ``linsolve.lu_solve`` (elementwise ``where`` swaps — no data-dependent
    branching).
    """
    k = len(bs)
    # augmented rows: n + k entries each
    rows = [[A[i][j] for j in range(n)] + [b[i] for b in bs]
            for i in range(n)]
    for col in range(n):
        for r in range(col + 1, n):
            swap = jnp.abs(rows[r][col]) > jnp.abs(rows[col][col])
            # entries j < col are already eliminated and never read again
            # (back-substitution only touches j > row): swap/eliminate the
            # LIVE suffix only — bit-identical results, ~25% fewer ops
            new_hi = [jnp.where(swap, rows[r][j], rows[col][j])
                      for j in range(col, n + k)]
            new_lo = [jnp.where(swap, rows[col][j], rows[r][j])
                      for j in range(col, n + k)]
            rows[col][col:] = new_hi
            rows[r][col:] = new_lo
        inv = 1.0 / rows[col][col]
        for r in range(col + 1, n):
            f = rows[r][col] * inv
            rows[r][col + 1:] = [rows[r][j] - f * rows[col][j]
                                 for j in range(col + 1, n + k)]
    xs = [[None] * n for _ in range(k)]
    for row in range(n - 1, -1, -1):
        inv = 1.0 / rows[row][row]
        for b in range(k):
            acc = rows[row][n + b]
            for col in range(row + 1, n):
                acc = acc - rows[row][col] * xs[b][col]
            xs[b][row] = acc * inv
    return xs


def _jacobi_sweep(Ac, V, n):
    """One cyclic Jacobi sweep on scalarized symmetric components.

    Same rotation math as ``jacobi._rotate``; state lives in vector
    registers/VMEM inside the kernel (no HBM carry).
    """
    zero = jnp.zeros_like(Ac[0][0])
    tiny = jnp.finfo(Ac[0][0].dtype).tiny * 1e3
    for p in range(n - 1):
        for q in range(p + 1, n):
            apq = Ac[p][q]
            app = Ac[p][p]
            aqq = Ac[q][q]
            small = jnp.abs(apq) <= tiny
            denom = jnp.where(small, 1.0, 2.0 * apq)
            tau = (aqq - app) / denom
            t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
            t = jnp.where(jnp.sign(tau) == 0,
                          1.0 / (tau + jnp.sqrt(1.0 + tau * tau)), t)
            t = jnp.where(small, 0.0, t)
            c = 1.0 / jnp.sqrt(1.0 + t * t)
            s = t * c
            new_pp = c * c * app - 2.0 * s * c * apq + s * s * aqq
            new_qq = s * s * app + 2.0 * s * c * apq + c * c * aqq
            for r in range(n):
                if r == p or r == q:
                    continue
                arp = Ac[r][p]
                arq = Ac[r][q]
                nrp = c * arp - s * arq
                nrq = s * arp + c * arq
                Ac[r][p] = nrp
                Ac[p][r] = nrp
                Ac[r][q] = nrq
                Ac[q][r] = nrq
            Ac[p][p] = new_pp
            Ac[q][q] = new_qq
            Ac[p][q] = zero
            Ac[q][p] = zero
            for r in range(n):
                vrp = V[r][p]
                vrq = V[r][q]
                V[r][p] = c * vrp - s * vrq
                V[r][q] = s * vrp + c * vrq
    return Ac, V


def _jacobi(Ac, n, sweeps, unroll_sweeps=False):
    """Cyclic Jacobi on scalarized components.

    The sweep loop is a ``fori_loop`` whose carry is the tuple of matrix
    components — on-chip state only, but a compact graph that Mosaic
    compiles quickly (the fully unrolled 10-sweep form compiles for
    minutes).  Returns (diag eigenvalue tiles, eigenvector lists V[r][k]).
    """
    from jax import lax

    one = jnp.ones_like(Ac[0][0])
    zero = jnp.zeros_like(Ac[0][0])
    V = [[one if i == j else zero for j in range(n)] for i in range(n)]

    if unroll_sweeps or n == 1:
        for _ in range(sweeps):
            Ac, V = _jacobi_sweep(Ac, V, n)
    else:
        def body(_, AV):
            At, Vt = AV
            Al = [list(row) for row in At]
            Vl = [list(row) for row in Vt]
            Al, Vl = _jacobi_sweep(Al, Vl, n)
            return (tuple(map(tuple, Al)), tuple(map(tuple, Vl)))

        At, Vt = lax.fori_loop(
            0, sweeps, body,
            (tuple(map(tuple, Ac)), tuple(map(tuple, V))))
        Ac = [list(row) for row in At]
        V = [list(row) for row in Vt]

    w = [Ac[i][i] for i in range(n)]
    return w, V


# ---------------------------------------------------------------------------
# fused homogeneous + thermal kernel
# ---------------------------------------------------------------------------

def _stage1_isotropic(ssa_ref, dtau_ref, btop_ref, slope_ref,
                      gp_ref, gm_ref, lam_ref, expd_ref,
                      y0p_ref, y0m_ref, y1_ref,
                      *, ang: StaticAngles, thermal: bool,
                      bisect: int | None = None, newton: int | None = None,
                      beam_refs=None, beam_outs=None):
    """Exact isotropic-scattering eigenstructure via the secular equation.

    For ``nmom == 0`` at mode ``m == 0`` (every pure-gas / grey band — the
    RFM LW configuration of ``examples/amars_lw.cpp`` has no SSA plane at
    all, and the bench's isotropic thermal problem is this class), the
    even operator is the rank-one ``Se = 1 1^T`` and the odd operator
    vanishes, so ``Uhat Vhat = diag(1/mu_i^2) - ssa a b^T``.  Its
    eigenvalues are the roots of the secular function

        f(x) = 1 - ssa sum_i (w_i / mu_i^2) / (1/mu_i^2 - x),

    one in each interval between consecutive poles ``1/mu_i^2`` (plus one
    below the smallest; ``f(0) = 1 - ssa > 0``), found here by
    fixed-schedule bracketed bisection + safeguarded Newton.  The
    eigenvectors are closed-form in the division-free factored form
    ``D[i][k] = (1/mu_i) prod_{j != i} (d_j - x_k)`` (exact at the
    ``ssa -> 0`` pole-collision limit, where it degenerates to the
    decoupled ``e_i`` modes), and the thermal particular collapses to
    ``h = 1`` (Sherman-Morrison on ``I - ssa 1 w^T``):
    ``y1 = slope``, ``y0p/m = btop +- mu_i slope``.

    This replaces the Cholesky + Jacobi + matmul + LU pipeline of the
    general path with ~N divisions per Newton step — the instruction-
    bound stage-1 cost collapses (VERDICT r4 weak item 1 / next-round
    item 1).
    """
    N = ang.mu.shape[0]
    if bisect is None:
        # bisection-heavy schedules measured BOTH cheaper and more
        # accurate than Newton-heavy ones (Newton clamped inside a wide
        # bracket can stall on a boundary; r5 A/B vs the f64 Jacobi
        # reference: (10,2) at 8.6e-7 vs the old (8,4) at 2.6e-4 scaled
        # eigenvalue error).  Wider stream counts have wider pole
        # brackets (d_max = 1/mu_min^2), hence more bisections.
        bisect = 10 if N <= 4 else 12
    if newton is None:
        newton = 2
    mu = np.asarray(ang.mu, np.float64)
    w = np.asarray(ang.w, np.float64)
    d = 1.0 / mu**2                       # descending (mu ascending)
    c = w / mu**2                         # secular residues
    order = np.argsort(d)                 # ascending pole order
    e = d[order]                          # e[0] < e[1] < ...
    los = np.concatenate([[0.0], e[:-1]])
    his = e

    ssa = ssa_ref[:]                      # (TL, TB)
    dtau = dtau_ref[:]

    def secular_neg(x):
        """-f(x) pieces via u_i = 1/(x - d_i): f = 1 + ssa sum c_i u_i."""
        us = [1.0 / (x - float(d[i])) for i in range(N)]
        f = 1.0 + ssa * _addn([float(c[i]) * us[i] for i in range(N)], ssa)
        fp = -ssa * _addn([float(c[i]) * us[i] * us[i] for i in range(N)],
                          ssa)
        return f, fp

    def p_sign_pos(x, k):
        """sign(f(x)) > 0 via the division-free factored polynomial
        P(x) = prod_j t_j + ssa sum_i c_i prod_{j!=i} t_j, t_j = x - d_j;
        f and (-1)^(N-k) P share sign on bracket k."""
        t = [x - float(d[order[j]]) for j in range(N)]
        # prefix/suffix products over the sorted poles
        pre = [None] * (N + 1)
        suf = [None] * (N + 1)
        pre[0] = 1.0
        for j in range(N):
            pre[j + 1] = (t[j] if j == 0 else pre[j] * t[j])
        suf[N] = 1.0
        for j in range(N - 1, -1, -1):
            suf[j] = (t[j] if j == N - 1 else t[j] * suf[j + 1])
        full = pre[N]
        parts = []
        for i in range(N):
            ci = float(c[order[i]])
            left = pre[i] if i > 0 else None
            right = suf[i + 1] if i < N - 1 else None
            if left is None and right is None:
                parts.append(ci * jnp.ones_like(x))
            elif left is None:
                parts.append(ci * right)
            elif right is None:
                parts.append(ci * left)
            else:
                parts.append(ci * (left * right))
        P = full + ssa * _addn(parts, ssa)
        sgn = 1.0 if (N - k) % 2 == 0 else -1.0
        return (sgn * P) > 0.0

    xs = []
    for k in range(N):
        lo = jnp.full_like(ssa, float(los[k]))
        hi = jnp.full_like(ssa, float(his[k]))
        for _ in range(bisect):
            m = 0.5 * (lo + hi)
            pos = p_sign_pos(m, k)        # f(m) > 0 -> root above m
            lo = jnp.where(pos, m, lo)
            hi = jnp.where(pos, hi, m)
        x = 0.5 * (lo + hi)
        for _ in range(newton):
            f, fp = secular_neg(x)
            fp_safe = jnp.where(fp < -1e-30, fp, -1e-30)
            xn = jnp.clip(x - f / fp_safe, lo, hi)
            # when ssa ~ 0 the root is within f32-eps of its pole; an
            # iterate clipped EXACTLY onto the pole makes the next f/fp
            # inf/inf -> NaN.  Keeping the last finite iterate is exact
            # there: the factored eigenvector form degenerates cleanly at
            # x == pole (decoupled-stream limit).
            x = jnp.where(jnp.isfinite(xn), xn, x)
        xs.append(x)

    # eigen quantities; x_k ascending in k
    lams = [jnp.sqrt(jnp.maximum(xs[k], 1e-12)) for k in range(N)]
    invlam = [jax.lax.rsqrt(jnp.maximum(xs[k], 1e-12)) for k in range(N)]

    gp = [[None] * N for _ in range(N)]
    gm = [[None] * N for _ in range(N)]
    for k in range(N):
        t = [float(d[i]) - xs[k] for i in range(N)]
        Dk = []
        for i in range(N):
            prod = None
            for j in range(N):
                if j == i:
                    continue
                prod = t[j] if prod is None else prod * t[j]
            if prod is None:              # N == 1
                prod = jnp.ones_like(ssa)
            Dk.append(float(1.0 / mu[i]) * prod)
        Sk = [-Dk[i] * float(1.0 / mu[i]) * invlam[k] for i in range(N)]
        for i in range(N):
            gp[i][k] = 0.5 * (Sk[i] + Dk[i])
            gm[i][k] = 0.5 * (Sk[i] - Dk[i])

    # per-mode normalization (same conditioning as the general path)
    for k in range(N):
        mx = jnp.abs(gp[0][k])
        for i in range(N):
            mx = jnp.maximum(mx, jnp.abs(gp[i][k]))
            mx = jnp.maximum(mx, jnp.abs(gm[i][k]))
        inv = 1.0 / jnp.maximum(mx, 1e-30)
        for i in range(N):
            gp[i][k] = gp[i][k] * inv
            gm[i][k] = gm[i][k] * inv

    for i in range(N):
        lam_ref[i] = lams[i]
        expd_ref[i] = jnp.exp(-lams[i] * dtau)
        for k in range(N):
            gp_ref[i, k] = gp[i][k]
            gm_ref[i, k] = gm[i][k]

    if thermal:
        slope = slope_ref[:]
        btop = btop_ref[:]
        for i in range(N):
            y1_ref[i] = slope
            y0p_ref[i] = btop + float(mu[i]) * slope
            y0m_ref[i] = btop - float(mu[i]) * slope
    else:
        zero = jnp.zeros_like(ssa)
        for i in range(N):
            y1_ref[i] = zero
            y0p_ref[i] = zero
            y0m_ref[i] = zero

    if beam_refs is not None:
        # isotropic beam particular: only the l = 0 moment survives, so
        # q+ = q- = kappa, qd = 0, Vfull = I and Ufull = I - ssa 1 w^T
        # (Sherman-Morrison-trivial), mirroring solver._beam_from_q
        fbeam_ref, mur_ref, _ = beam_refs
        zp_ref, zm_ref = beam_outs
        kappa = 1.0 / (4.0 * np.pi)
        amp = ssa * fbeam_ref[0]
        mur = mur_ref[:]
        qs = [2.0 * kappa * amp for _ in range(N)]
        rhs = [qs[i] * float(1.0 / mu[i] ** 2) for i in range(N)]
        S_mat = [[gp[i][k] + gm[i][k] for k in range(N)] for i in range(N)]
        (cc,) = _lu_solve_cols(S_mat, [rhs], N)
        inv_mur2 = 1.0 / (mur * mur)
        scaled = []
        for k in range(N):
            lam2k = jnp.maximum(xs[k], 1e-12)
            den = lam2k - inv_mur2
            floor = 1e-4 * (lam2k + inv_mur2)
            den = jnp.where(jnp.abs(den) < floor,
                            jnp.where(den < 0, -floor, floor), den)
            scaled.append(cc[k] / den)
        zs = [_addn([S_mat[i][k] * scaled[k] for k in range(N)], ssa)
              for i in range(N)]
        wz = _addn([float(w[j]) * zs[j] for j in range(N)], ssa)
        for i in range(N):
            uz = zs[i] - ssa * wz            # (I - ssa 1 w^T) zs
            zd_i = -mur * (uz - qs[i]) * float(1.0 / mu[i])
            zp_ref[i] = 0.5 * (zs[i] + zd_i)
            zm_ref[i] = 0.5 * (zs[i] - zd_i)


def _stage1_kernel(*refs, ang: StaticAngles, nmom: int, sweeps: int,
                   thermal: bool, beam: bool = False):
    if beam:
        (ssa_ref, pmom_ref, dtau_ref, btop_ref, slope_ref,
         fbeam_ref, mur_ref, lam0_ref,
         gp_ref, gm_ref, lam_ref, expd_ref,
         y0p_ref, y0m_ref, y1_ref, zp_ref, zm_ref) = refs
        beam_refs = (fbeam_ref, mur_ref, lam0_ref)
        beam_outs = (zp_ref, zm_ref)
    else:
        (ssa_ref, pmom_ref, dtau_ref, btop_ref, slope_ref,
         gp_ref, gm_ref, lam_ref, expd_ref,
         y0p_ref, y0m_ref, y1_ref) = refs
        beam_refs = beam_outs = None
    if nmom == 0 and ang.m == 0:
        # isotropic fast path: exact secular-equation eigenstructure
        _stage1_isotropic(ssa_ref, dtau_ref, btop_ref, slope_ref,
                          gp_ref, gm_ref, lam_ref, expd_ref,
                          y0p_ref, y0m_ref, y1_ref,
                          ang=ang, thermal=thermal,
                          beam_refs=beam_refs, beam_outs=beam_outs)
        return
    N = ang.mu.shape[0]
    dtype = ssa_ref.dtype
    even_tab, odd_tab = _phase_outer_tables(ang, np.float32)  # (G, N, N)
    G = even_tab.shape[0]
    mu = [float(m) for m in ang.mu]
    w = [float(x) for x in ang.w]
    sqm = [float(np.sqrt(m)) for m in ang.mu]
    sqw = [float(np.sqrt(x)) for x in ang.w]

    ssa = ssa_ref[:]                     # (TL, TB)
    dtau = dtau_ref[:]
    # g coefficients: g_0 = 1 static; g_l from pmom (already delta-M scaled
    # and truncated above nstr-1 by _moment_coeffs semantics — the static
    # tables carry the truncation, see _phase_outer_tables)
    g = [None] * G
    for l in range(1, min(G, nmom + 1)):
        g[l] = pmom_ref[l - 1]

    def contract(tab, i, j):
        """sum_l tab[l,i,j] g_l with g_0 = 1 (static-skip zeros)."""
        acc = None
        const = float(tab[0, i, j])
        for l in range(1, G):
            t = float(tab[l, i, j])
            if t == 0.0 or g[l] is None:
                continue
            term = t * g[l]
            acc = term if acc is None else acc + term
        if acc is None:
            acc = jnp.zeros_like(ssa)
        if const != 0.0:
            acc = acc + const
        return acc

    Se = [[contract(even_tab, i, j) for j in range(N)] for i in range(N)]
    So = [[contract(odd_tab, i, j) for j in range(N)] for i in range(N)]

    # Uhat / Vhat (symmetric scaled operators)
    Uhat = [[(float(i == j) - ssa * (sqw[i] * sqw[j]) * Se[i][j])
             / (sqm[i] * sqm[j]) for j in range(N)] for i in range(N)]
    Vhat = [[(float(i == j) - ssa * (sqw[i] * sqw[j]) * So[i][j])
             / (sqm[i] * sqm[j]) for j in range(N)] for i in range(N)]

    Lc = _chol(Uhat, N)
    # K = Lc^T Vhat Lc (symmetric)
    VL = _matmul(Vhat, Lc, N)
    K = [[_addn([_mul(Lc[k][i], VL[k][j]) for k in range(N)], ssa)
          for j in range(N)] for i in range(N)]

    lam2, Y = _jacobi(K, N, sweeps)
    lam = [jnp.sqrt(jnp.maximum(l2, 1e-12)) for l2 in lam2]

    # D = M^-1/2 W^-1/2 Lc Y  (row scaling)
    X = _matmul(Lc, Y, N)
    D = [[X[i][k] / (sqm[i] * sqw[i]) for k in range(N)] for i in range(N)]

    # Vfull = I - ssa * So * w_j ; S = -(Vfull D) / (mu_i lam_k)
    Vfull = [[float(i == j) - ssa * So[i][j] * w[j]
              for j in range(N)] for i in range(N)]
    VD = _matmul(Vfull, D, N)
    S = [[-VD[i][k] / (mu[i] * lam[k]) for k in range(N)] for i in range(N)]

    gp = [[0.5 * (S[i][k] + D[i][k]) for k in range(N)] for i in range(N)]
    gm = [[0.5 * (S[i][k] - D[i][k]) for k in range(N)] for i in range(N)]

    # per-mode normalization (conditioning, matches solver.py)
    for k in range(N):
        mx = jnp.abs(gp[0][k])
        for i in range(N):
            mx = jnp.maximum(mx, jnp.abs(gp[i][k]))
            mx = jnp.maximum(mx, jnp.abs(gm[i][k]))
        inv = 1.0 / jnp.maximum(mx, 1e-30)
        for i in range(N):
            gp[i][k] = gp[i][k] * inv
            gm[i][k] = gm[i][k] * inv

    for i in range(N):
        lam_ref[i] = lam[i]
        expd_ref[i] = jnp.exp(-lam[i] * dtau)
        for k in range(N):
            gp_ref[i, k] = gp[i][k]
            gm_ref[i, k] = gm[i][k]

    if thermal:
        Ufull = [[float(i == j) - ssa * Se[i][j] * w[j]
                  for j in range(N)] for i in range(N)]
        one_minus = 1.0 - ssa
        (h,) = _lu_solve_cols(Ufull, [[one_minus] * N], N)
        slope = slope_ref[:]
        btop = btop_ref[:]
        y1 = [slope * h[i] for i in range(N)]
        (y0d,) = _lu_solve_cols(Vfull, [[2.0 * mu[i] * y1[i]
                                         for i in range(N)]], N)
        for i in range(N):
            y1_ref[i] = y1[i]
            y0p_ref[i] = btop * h[i] + 0.5 * y0d[i]
            y0m_ref[i] = btop * h[i] - 0.5 * y0d[i]
    else:
        zero = jnp.zeros_like(ssa)
        for i in range(N):
            y1_ref[i] = zero
            y0p_ref[i] = zero
            y0m_ref[i] = zero

    if beam:
        # ---- beam particular Z+- in-kernel (mirrors solver._beam_from_q;
        # the XLA formulation materializes (N, N, L, B) operator tensors
        # and a batched pivoted LU through HBM — measured 9.2 ms of the
        # 26.9 ms sw-lbl step and 55 ms of the aerosol-16str step; here
        # the operators are already live in registers) ----
        lam_tab = ang.lam_tables                       # (G, N) static
        par = ang.parity
        kappa = 1.0 / (4.0 * np.pi)                    # m = 0
        fbeam_row = fbeam_ref[0]                       # (TB,)
        mur = mur_ref[:]                               # (TL, TB)
        lcut = min(G, ang.nstr)
        # q+-[i] = kappa sum_l (2l+1) par_l g_l Lam_l(mu0) Lam_l(+-mu_i)
        coef = [None] * lcut
        for l in range(lcut):
            c2p = (2 * l + 1) * float(par[l])
            base = c2p * lam0_ref[l]
            coef[l] = base if l == 0 or g[l] is None else base * g[l]
            if l > 0 and g[l] is None:
                coef[l] = None
        qp_b = []
        qm_b = []
        for i in range(N):
            accp = accm = None
            for l in range(lcut):
                t = float(lam_tab[l, i])
                if t == 0.0 or coef[l] is None:
                    continue
                termp = coef[l] * t
                termm = coef[l] * (t * float(par[l]))
                accp = termp if accp is None else accp + termp
                accm = termm if accm is None else accm + termm
            qp_b.append(kappa * (accp if accp is not None
                                 else jnp.zeros_like(ssa)))
            qm_b.append(kappa * (accm if accm is not None
                                 else jnp.zeros_like(ssa)))
        amp = ssa * fbeam_row
        qs = [(qp_b[i] + qm_b[i]) * amp for i in range(N)]
        qd = [(qp_b[i] - qm_b[i]) * amp for i in range(N)]
        rhs = [(_addn([Vfull[i][j] * (qs[j] / mu[j]) for j in range(N)],
                      ssa)) / mu[i] - qd[i] / (mu[i] * mur)
               for i in range(N)]
        S_mat = [[gp[i][k] + gm[i][k] for k in range(N)] for i in range(N)]
        (c,) = _lu_solve_cols(S_mat, [rhs], N)
        inv_mur2 = 1.0 / (mur * mur)
        zs = [None] * N
        scaled = []
        for k in range(N):
            lam2k = lam[k] * lam[k]
            den = lam2k - inv_mur2
            floor = 1e-4 * (lam2k + inv_mur2)
            den = jnp.where(jnp.abs(den) < floor,
                            jnp.where(den < 0, -floor, floor), den)
            scaled.append(c[k] / den)
        for i in range(N):
            zs[i] = _addn([S_mat[i][k] * scaled[k] for k in range(N)], ssa)
        Ufull_b = [[float(i == j) - ssa * Se[i][j] * w[j]
                    for j in range(N)] for i in range(N)]
        for i in range(N):
            uz = _addn([Ufull_b[i][j] * zs[j] for j in range(N)], ssa)
            zd_i = -mur * (uz - qs[i]) / mu[i]
            zp_ref[i] = 0.5 * (zs[i] + zd_i)
            zm_ref[i] = 0.5 * (zs[i] - zd_i)


def fused_homogeneous_thermal(
    ssa, pmom, dtau, b_top, slope, ang: StaticAngles,
    *, thermal: bool = True, sweeps: int | None = None,
    block=(8, 1024), interpret=None,
    fbeam=None, mur=None, lam0=None,
):
    """Pallas-fused ``homogeneous_solution`` + ``thermal_particular``
    (+ optionally ``beam_particular``).

    Args match ``solver.homogeneous_solution`` /
    ``solver.thermal_particular``: ssa/dtau/b_top/slope ``(L, B)``,
    pmom ``(L, nmom, B)`` (delta-M scaled).

    When ``fbeam`` (B,), ``mur`` (L, B) (the per-layer beam decay cosine:
    broadcast mu0 plane-parallel, ``mu_eff`` under spher) and ``lam0``
    (G, B) (``lepoly(mu0, 0)``) are given, the beam particular Z+- is
    computed IN-KERNEL on the already-live operators and returned as two
    extra outputs — the XLA formulation's (N, N, L, B) intermediates and
    batched pivoted LU cost 9-55 ms/step at the SW bench shapes (r5).

    Returns ``(gp, gm, lam, expd, y0p, y0m, y1[, zp, zm])`` with the
    solver layouts ``(N, N, L, B)`` / ``(N, L, B)``.
    """
    beam = fbeam is not None
    N = ang.mu.shape[0]
    L, B = ssa.shape
    nmom = pmom.shape[1]
    dtype = ssa.dtype
    if sweeps is None:
        # cyclic Jacobi converges quadratically: measured BIT-convergence
        # (identical f32 output vs more sweeps) at 3 sweeps for N <= 4 on
        # realistic DISORT matrices incl. near-conservative ssa up to 0.99
        # with anisotropic moments (r4 sweep on the chip); one extra sweep
        # of margin.  N = 8 (nstr 16) keeps the conservative 8.
        sweeps = 3 if N <= 2 else (4 if N <= 4 else 8)
    if interpret is None:   # emulate off-TPU (CPU tests of the kernel path)
        interpret = jax.default_backend() != "tpu"

    TL, TB = block
    TL = min(TL, L)
    TB = min(TB, B)
    # VMEM footprint scales ~N^2 (gp/gm blocks are (N, N, TL, TB)); the
    # (8, 1024) default fits the 16 MB scoped limit up to N = 4 — shrink
    # the batch tile for wider stream counts (nstr = 16 at production
    # batch previously hit "Ran out of memory in memory space vmem";
    # 512 lanes measured fastest of the fitting tiles, r5 A/B)
    if block == (8, 1024) and N > 4:
        TB = min(TB, 512)
    grid = (pl.cdiv(L, TL), pl.cdiv(B, TB))

    # pmom transposed to (nmom, L, B) so the block carries all moments;
    # Mosaic rejects zero-size operands, so a moment-free problem
    # (isotropic, e.g. pure thermal LW) ships one dummy plane the kernel
    # statically ignores (nmom=0 -> the g loop is empty)
    if nmom == 0:
        pmom_t = jnp.zeros((1, L, B), dtype)
        nblk = 1
    else:
        pmom_t = jnp.moveaxis(pmom, 1, 0)
        nblk = nmom

    def im2(i, j):
        return (i, j)

    def im3(i, j):
        return (0, i, j)

    def im_nn(i, j):
        return (0, 0, i, j)

    in_specs = [
        pl.BlockSpec((TL, TB), im2, memory_space=pltpu.VMEM),          # ssa
        pl.BlockSpec((nblk, TL, TB), im3, memory_space=pltpu.VMEM),    # pmom
        pl.BlockSpec((TL, TB), im2, memory_space=pltpu.VMEM),          # dtau
        pl.BlockSpec((TL, TB), im2, memory_space=pltpu.VMEM),          # btop
        pl.BlockSpec((TL, TB), im2, memory_space=pltpu.VMEM),          # slope
    ]
    args = [ssa, pmom_t, dtau, b_top, slope]
    if beam:
        G = ang.lam_tables.shape[0]

        def im_row(i, j):
            return (0, j)

        def im_g(i, j):
            return (0, j)

        in_specs += [
            pl.BlockSpec((1, TB), im_row, memory_space=pltpu.VMEM),    # fbeam
            pl.BlockSpec((TL, TB), im2, memory_space=pltpu.VMEM),      # mur
            pl.BlockSpec((G, TB), im_g, memory_space=pltpu.VMEM),      # lam0
        ]
        args += [fbeam[None, :], mur, lam0]
    out_shape = [
        _sds((N, N, L, B), dtype, ssa),   # gp
        _sds((N, N, L, B), dtype, ssa),   # gm
        _sds((N, L, B), dtype, ssa),      # lam
        _sds((N, L, B), dtype, ssa),      # expd
        _sds((N, L, B), dtype, ssa),      # y0p
        _sds((N, L, B), dtype, ssa),      # y0m
        _sds((N, L, B), dtype, ssa),      # y1
    ]
    out_specs = [
        pl.BlockSpec((N, N, TL, TB), im_nn, memory_space=pltpu.VMEM),
        pl.BlockSpec((N, N, TL, TB), im_nn, memory_space=pltpu.VMEM),
        pl.BlockSpec((N, TL, TB), im3, memory_space=pltpu.VMEM),
        pl.BlockSpec((N, TL, TB), im3, memory_space=pltpu.VMEM),
        pl.BlockSpec((N, TL, TB), im3, memory_space=pltpu.VMEM),
        pl.BlockSpec((N, TL, TB), im3, memory_space=pltpu.VMEM),
        pl.BlockSpec((N, TL, TB), im3, memory_space=pltpu.VMEM),
    ]
    if beam:
        out_shape += [_sds((N, L, B), dtype, ssa),    # zp
                      _sds((N, L, B), dtype, ssa)]    # zm
        out_specs += [
            pl.BlockSpec((N, TL, TB), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, TL, TB), im3, memory_space=pltpu.VMEM),
        ]

    kernel = functools.partial(
        _stage1_kernel, ang=ang, nmom=nmom, sweeps=sweeps, thermal=thermal,
        beam=beam)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# BVP layer-coupling solve (factored block-tridiagonal elimination)
# ---------------------------------------------------------------------------

def _bvp_fwd_kernel(gp_ref, gm_ref, e_ref, d_ref, alb_ref,
                    P_out, g_out, Rs, Ps, gs,
                    *, N: int, L: int, CL: int, wmu: tuple):
    """Forward elimination for one (B-tile, layer-chunk) grid cell.

    Each grid cell processes ``CL`` consecutive layers (the TPU lowering
    needs >= 8 in the sublane block dim); the carry (R, P, g) lives in VMEM
    scratch and persists across the chunk-innermost grid dimension.
    Mirrors the ``fwd`` body of ``solver.solve_bvp`` scalarized over the
    matrix dims.  Padded tail sublayers compute garbage whose writes Pallas
    drops; nothing downstream consumes their carry.
    """
    c = pl.program_id(1)
    zero = jnp.zeros_like(alb_ref[0])

    @pl.when(c == 0)
    def _():
        for i in range(N):
            for j in range(2 * N):
                Rs[i, j] = zero
        for i in range(2 * N):
            for j in range(N):
                Ps[i, j] = zero
            gs[i] = zero

    one = jnp.ones_like(zero)

    # one fori_loop iteration per sublayer (graph stays ~CL-times smaller
    # than a full unroll — the remote Mosaic compile is graph-size-bound);
    # the carry flows through the VMEM scratch refs
    def body(s, _):
        Rp = [[Rs[i, j] for j in range(2 * N)] for i in range(N)]
        Pp = [[Ps[i, j] for j in range(N)] for i in range(2 * N)]
        gpv = [gs[i] for i in range(2 * N)]

        gpn = [[gp_ref[i, k, s] for k in range(N)] for i in range(N)]
        gmn = [[gm_ref[i, k, s] for k in range(N)] for i in range(N)]
        En = [e_ref[i, s] for i in range(N)]
        dn = [d_ref[i, s] for i in range(2 * N)]

        # blocks (N rows x 2N cols): Ttop = [gm, gp E]; Blow = [gp E, gm];
        # Rn = [gm E, gp]; Dn = [gp, gm E]
        Ttop = [[gmn[i][j] for j in range(N)]
                + [gpn[i][j] * En[j] for j in range(N)] for i in range(N)]
        Blow = [[gpn[i][j] * En[j] for j in range(N)]
                + [gmn[i][j] for j in range(N)] for i in range(N)]
        Rn = [[gmn[i][j] * En[j] for j in range(N)]
              + [gpn[i][j] for j in range(N)] for i in range(N)]
        Dn = [[gpn[i][j] for j in range(N)]
              + [gmn[i][j] * En[j] for j in range(N)] for i in range(N)]

        # Lambertian reflection folds in only on the last layer
        last = (c * CL + s == L - 1).astype(zero.dtype)
        alb2 = 2.0 * alb_ref[0] * last
        for j in range(2 * N):
            refl = _addn([float(wmu[r]) * Rn[r][j] for r in range(N)], zero)
            for i in range(N):
                Blow[i][j] = Blow[i][j] - alb2 * refl

        # Q = R_prev P_prev (N x N); Mtop = -Ttop + Q Dn
        Q = [[_addn([Rp[i][k] * Pp[k][j] for k in range(2 * N)], zero)
              for j in range(N)] for i in range(N)]
        Mtop = [[-Ttop[i][j]
                 + _addn([Q[i][k] * Dn[k][j] for k in range(N)], zero)
                 for j in range(2 * N)] for i in range(N)]
        Mn = Mtop + Blow                               # (2N) rows x (2N)

        # rhs: [dn_top - R_prev g_prev ; dn_bot], plus N unit columns
        # selecting the lower block of C (csel)
        rhs_vec = [dn[i] - _addn([Rp[i][k] * gpv[k]
                                  for k in range(2 * N)], zero)
                   for i in range(N)] + [dn[N + i] for i in range(N)]
        unit_cols = [[one if r == N + q else zero for r in range(2 * N)]
                     for q in range(N)]
        sols = _lu_solve_cols(Mn, unit_cols + [rhs_vec], 2 * N)
        Pn = [[sols[q][r] for q in range(N)] for r in range(2 * N)]
        gn = sols[N]

        for i in range(2 * N):
            for j in range(N):
                P_out[i, j, s] = Pn[i][j]
                Ps[i, j] = Pn[i][j]
            g_out[i, s] = gn[i]
            gs[i] = gn[i]
        for i in range(N):
            for j in range(2 * N):
                Rs[i, j] = Rn[i][j]
        return 0

    jax.lax.fori_loop(0, CL, body, 0)


def _bvp_bwd_kernel(gp_ref, gm_ref, e_ref, P_ref, g_ref,
                    a_out, b_out, dxs,
                    *, N: int, L: int, CL: int, nchunk: int):
    """Back-substitution (layer chunks in reverse grid order)."""
    j = pl.program_id(1)
    c = nchunk - 1 - j                     # real chunk index
    zero = jnp.zeros_like(g_ref[0, 0])

    @pl.when(j == 0)
    def _():
        for i in range(N):
            dxs[i] = zero

    def body(i_s, _):
        s = CL - 1 - i_s
        dx = [dxs[i] for i in range(N)]
        xn = [g_ref[i, s] + _addn([P_ref[i, k, s] * dx[k]
                                   for k in range(N)], zero)
              for i in range(2 * N)]
        for i in range(N):
            a_out[i, s] = xn[i]
            b_out[i, s] = xn[N + i]
        # dx_{l-1} = gp x_a + gm E x_b of THIS layer; padded tail sublayers
        # (l >= L, first iterations of the last chunk) must not pollute the
        # carry feeding the valid layers.  NOTE: must be a select, not an
        # arithmetic mask — the padded lanes hold garbage (often NaN) and
        # 0 * NaN = NaN would still poison the carry.
        valid = c * CL + s <= L - 1
        for i in range(N):
            dxs[i] = jnp.where(valid, _addn(
                [gp_ref[i, k, s] * xn[k] for k in range(N)]
                + [gm_ref[i, k, s] * e_ref[k, s] * xn[N + k]
                   for k in range(N)],
                zero), dx[i])
        return 0

    jax.lax.fori_loop(0, CL, body, 0)


def _bvp_bwd_flux_kernel(gp_ref, gm_ref, e_ref, P_ref, g_ref, tp_ref, tm_ref,
                         pbp_ref, pbm_ref,
                         fl_out, flb_out, dxs,
                         *, N: int, L: int, CL: int, nchunk: int, wmu: tuple):
    """Back-substitution fused with the level-flux contraction.

    Emits the wmu-weighted up/down sums at each LAYER TOP directly —
    ``fl[0, l] = sum_i wmu_i (gp a + gm E b + ptop_p)_i`` and the gm/gp-
    swapped downward analog — instead of materializing a, b for a separate
    XLA flux-assembly pass (which would re-read the ~GB gp/gm tensors from
    HBM).  The up-sum is exactly the carry update ``dx``, so it costs
    nothing extra; the down-sum adds 2 N^2 madds per layer.  The BOTTOM-
    LEVEL fluxes are also contracted IN-KERNEL (``flb_out``, needing the
    bottom particular values pbp/pbm) so the caller's epilogue consumes
    ONLY kernel outputs: if it read gp/gm/particulars after this kernel,
    XLA rematerializes the whole upstream graph rather than keep the
    multi-GB live set across the call — measured 2x the step time at the
    aerosol-16str shape (r5).
    """
    j = pl.program_id(1)
    c = nchunk - 1 - j                     # real chunk index
    zero = jnp.zeros_like(g_ref[0, 0])

    @pl.when(j == 0)
    def _():
        for i in range(N):
            dxs[i] = zero
        flb_out[0] = zero
        flb_out[1] = zero

    def body(i_s, _):
        s = CL - 1 - i_s
        dx = [dxs[i] for i in range(N)]
        xn = [g_ref[i, s] + _addn([P_ref[i, k, s] * dx[k]
                                   for k in range(N)], zero)
              for i in range(2 * N)]
        # bottom-LEVEL fluxes from the bottom layer's coefficients
        # (processed in the FIRST grid step; the where keeps the constant-
        # index-map accumulator block fixed once written):
        #   up_bot = gp E a + gm b + pb_p (E-ordering swapped vs layer top)
        is_bot = c * CL + s == L - 1
        upb = [_addn([gp_ref[i, k, s] * e_ref[k, s] * xn[k]
                      for k in range(N)]
                     + [gm_ref[i, k, s] * xn[N + k] for k in range(N)],
                     zero) + pbp_ref[i] for i in range(N)]
        dnb = [_addn([gm_ref[i, k, s] * e_ref[k, s] * xn[k]
                      for k in range(N)]
                     + [gp_ref[i, k, s] * xn[N + k] for k in range(N)],
                     zero) + pbm_ref[i] for i in range(N)]
        flb_out[0] = jnp.where(
            is_bot, _addn([float(wmu[i]) * upb[i] for i in range(N)], zero),
            flb_out[0])
        flb_out[1] = jnp.where(
            is_bot, _addn([float(wmu[i]) * dnb[i] for i in range(N)], zero),
            flb_out[1])
        upv = [_addn([gp_ref[i, k, s] * xn[k] for k in range(N)]
                     + [gm_ref[i, k, s] * e_ref[k, s] * xn[N + k]
                        for k in range(N)], zero) for i in range(N)]
        dnv = [_addn([gm_ref[i, k, s] * xn[k] for k in range(N)]
                     + [gp_ref[i, k, s] * e_ref[k, s] * xn[N + k]
                        for k in range(N)], zero) for i in range(N)]
        fl_out[0, s] = _addn([float(wmu[i]) * (upv[i] + tp_ref[i, s])
                              for i in range(N)], zero)
        fl_out[1, s] = _addn([float(wmu[i]) * (dnv[i] + tm_ref[i, s])
                              for i in range(N)], zero)
        # carry: see _bvp_bwd_kernel on the select-vs-mask requirement
        valid = c * CL + s <= L - 1
        for i in range(N):
            dxs[i] = jnp.where(valid, upv[i], dx[i])
        return 0

    jax.lax.fori_loop(0, CL, body, 0)


# ---------------------------------------------------------------------------
# single-pass fused BVP: forward elimination + back-substitution in ONE
# kernel (batch-only grid, whole layer axis resident per batch tile)
# ---------------------------------------------------------------------------

def _bvp_fused_kernel(gp_ref, gm_ref, e_ref, d_ref, alb_ref, tp_ref, tm_ref,
                      o1, o2, Ps, gs,
                      *, N: int, L: int, wmu: tuple, flux: bool):
    """Fused forward+backward block-tridiagonal solve for one batch tile.

    The two-kernel formulation (``_bvp_fwd_kernel`` + ``_bvp_bwd_kernel``)
    round-trips the ``(2N, N, L, B)`` P and ``(2N, L, B)`` g carries through
    HBM and re-reads gp/gm/E in the backward pass — at the bench shape
    that is ~2.1 GB of avoidable traffic per solve, the dominant term in
    the measured 33%-of-HBM-roofline gap (VERDICT r4 weak item 1b).  Here
    the grid is batch-only, the whole layer axis of every operand sits in
    VMEM for the current tile, P/g live in VMEM scratch, and the only
    cross-layer state in the forward sweep is the condensed carry
    ``Q = R_prev P_prev`` (N x N) and ``rg = R_prev g_prev`` (N) — computed
    at the end of each layer while P_n is still in registers.

    ``flux=True``: emit the wmu-weighted up/down sums at every layer top
    (``o1`` = (2, L, TB)) plus the bottom layer's (a, b) snapshot
    (``o2`` = (2N, TB)); ``flux=False``: emit a (``o1``) and b (``o2``),
    each (N, L, TB).  No padded-layer masking is needed — the block holds
    exactly L layers.
    """
    zero = jnp.zeros_like(alb_ref[0])
    one = jnp.ones_like(zero)

    def fwd_body(s, carry):
        Qc, rgc = carry
        Q = [[Qc[i][j] for j in range(N)] for i in range(N)]
        rg = [rgc[i] for i in range(N)]

        gpn = [[gp_ref[i, k, s] for k in range(N)] for i in range(N)]
        gmn = [[gm_ref[i, k, s] for k in range(N)] for i in range(N)]
        En = [e_ref[i, s] for i in range(N)]
        dn = [d_ref[i, s] for i in range(2 * N)]

        # blocks (N rows x 2N cols), see _bvp_fwd_kernel
        Ttop = [[gmn[i][j] for j in range(N)]
                + [gpn[i][j] * En[j] for j in range(N)] for i in range(N)]
        Blow = [[gpn[i][j] * En[j] for j in range(N)]
                + [gmn[i][j] for j in range(N)] for i in range(N)]
        Rn = [[gmn[i][j] * En[j] for j in range(N)]
              + [gpn[i][j] for j in range(N)] for i in range(N)]
        Dn = [[gpn[i][j] for j in range(N)]
              + [gmn[i][j] * En[j] for j in range(N)] for i in range(N)]

        last = (s == L - 1).astype(zero.dtype)
        alb2 = 2.0 * alb_ref[0] * last
        for j in range(2 * N):
            refl = _addn([float(wmu[r]) * Rn[r][j] for r in range(N)], zero)
            for i in range(N):
                Blow[i][j] = Blow[i][j] - alb2 * refl

        Mtop = [[-Ttop[i][j]
                 + _addn([Q[i][k] * Dn[k][j] for k in range(N)], zero)
                 for j in range(2 * N)] for i in range(N)]
        Mn = Mtop + Blow                               # (2N) rows x (2N)

        rhs_vec = [dn[i] - rg[i] for i in range(N)] \
            + [dn[N + i] for i in range(N)]
        unit_cols = [[one if r == N + q else zero for r in range(2 * N)]
                     for q in range(N)]
        sols = _lu_solve_cols(Mn, unit_cols + [rhs_vec], 2 * N)
        Pn = [[sols[q][r] for q in range(N)] for r in range(2 * N)]
        gn = sols[N]

        for i in range(2 * N):
            for j in range(N):
                Ps[i, j, s] = Pn[i][j]
            gs[i, s] = gn[i]

        # condensed next-layer carry while P_n/g_n are live
        Qn = [[_addn([Rn[i][k] * Pn[k][j] for k in range(2 * N)], zero)
               for j in range(N)] for i in range(N)]
        rgn = [_addn([Rn[i][k] * gn[k] for k in range(2 * N)], zero)
               for i in range(N)]
        return (tuple(map(tuple, Qn)), tuple(rgn))

    Q0 = tuple(tuple(zero for _ in range(N)) for _ in range(N))
    rg0 = tuple(zero for _ in range(N))
    jax.lax.fori_loop(0, L, fwd_body, (Q0, rg0))

    if flux:
        for i in range(2 * N):
            o2[i] = zero

    def bwd_body(i_s, dxc):
        s = L - 1 - i_s
        dx = [dxc[i] for i in range(N)]
        xn = [gs[i, s] + _addn([Ps[i, k, s] * dx[k]
                                for k in range(N)], zero)
              for i in range(2 * N)]
        upv = [_addn([gp_ref[i, k, s] * xn[k] for k in range(N)]
                     + [gm_ref[i, k, s] * e_ref[k, s] * xn[N + k]
                        for k in range(N)], zero) for i in range(N)]
        if flux:
            is_bot = s == L - 1
            for i in range(2 * N):
                o2[i] = jnp.where(is_bot, xn[i], o2[i])
            dnv = [_addn([gm_ref[i, k, s] * xn[k] for k in range(N)]
                         + [gp_ref[i, k, s] * e_ref[k, s] * xn[N + k]
                            for k in range(N)], zero) for i in range(N)]
            o1[0, s] = _addn([float(wmu[i]) * (upv[i] + tp_ref[i, s])
                              for i in range(N)], zero)
            o1[1, s] = _addn([float(wmu[i]) * (dnv[i] + tm_ref[i, s])
                              for i in range(N)], zero)
        else:
            for i in range(N):
                o1[i, s] = xn[i]
                o2[i, s] = xn[N + i]
        return tuple(upv)

    jax.lax.fori_loop(0, L, bwd_body, tuple(zero for _ in range(N)))


def solve_bvp_fused(sol, ptop_p, ptop_m, pbot_p, pbot_m, ftop, bot_rhs,
                    albedo, ang: StaticAngles,
                    *, flux_only: bool, block_b=None, interpret=None):
    """Single-kernel BVP solve (forward + backward in one pass).

    Same contract as :func:`solve_bvp_pallas` (``flux_only=False`` ->
    (a, b)); with ``flux_only=True`` returns ``(fl, ab_last)`` where
    ``ab_last`` is the bottom layer's raw (a, b) snapshot (2N, B) —
    unlike the production :func:`solve_bvp_flux_pallas`, which now emits
    the contracted bottom-LEVEL flux row instead.  HBM traffic per solve is one read of gp/gm/E/dblk
    (+ptop pair) and one write of the outputs — the P/g carries never
    leave VMEM.
    """
    dtype = sol.lam.dtype
    N, L, B = sol.lam.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # VMEM per tile scales ~N^2 * L * TB; 128 lanes is the minimum tile
    # and keeps the N=4, L=100 working set (~5 MB + double-buffered
    # inputs) comfortably inside the 16 MB scoped limit
    TB = block_b or 128
    TB = min(TB, B)
    grid = (pl.cdiv(B, TB),)
    wmu = tuple(float(x) for x in (ang.w * ang.mu))

    gp, gm, E = sol.gp, sol.gm, sol.expd
    d_up = jnp.concatenate(
        [(ptop_m[:, 0] - ftop)[:, None, :],
         ptop_m[:, 1:] - pbot_m[:, : L - 1]], axis=1)
    d_lo = jnp.concatenate(
        [ptop_p[:, 1:] - pbot_p[:, : L - 1],
         bot_rhs[:, None, :]], axis=1)
    dblk = jnp.concatenate([d_up, d_lo], axis=0)        # (2N, L, B)
    alb = albedo[None]                                  # (1, B)

    def im_nn(i):
        return (0, 0, 0, i)

    def im_n(i):
        return (0, 0, i)

    def im_b(i):
        return (0, i)

    in_specs = [
        pl.BlockSpec((N, N, L, TB), im_nn, memory_space=pltpu.VMEM),
        pl.BlockSpec((N, N, L, TB), im_nn, memory_space=pltpu.VMEM),
        pl.BlockSpec((N, L, TB), im_n, memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * N, L, TB), im_n, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TB), im_b, memory_space=pltpu.VMEM),
        pl.BlockSpec((N, L, TB), im_n, memory_space=pltpu.VMEM),
        pl.BlockSpec((N, L, TB), im_n, memory_space=pltpu.VMEM),
    ]
    if flux_only:
        out_specs = [
            pl.BlockSpec((2, L, TB), im_n, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * N, TB), im_b, memory_space=pltpu.VMEM),
        ]
        out_shape = [
            _sds((2, L, B), dtype, sol.lam),
            _sds((2 * N, B), dtype, sol.lam),
        ]
    else:
        out_specs = [
            pl.BlockSpec((N, L, TB), im_n, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, L, TB), im_n, memory_space=pltpu.VMEM),
        ]
        out_shape = [
            _sds((N, L, B), dtype, sol.lam),
            _sds((N, L, B), dtype, sol.lam),
        ]

    return pl.pallas_call(
        functools.partial(_bvp_fused_kernel, N=N, L=L, wmu=wmu,
                          flux=flux_only),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2 * N, N, L, TB), dtype),   # P
            pltpu.VMEM((2 * N, L, TB), dtype),      # g
        ],
        interpret=interpret,
    )(gp, gm, E, dblk, alb, ptop_p, ptop_m)


def _bvp_tiles(N, L, B, block_b, chunk_l=None):
    TB = min(block_b, B)
    if block_b == 1024 and N > 4:
        # VMEM blocks scale ~N^2; 1024 lanes exceeds the scoped limit at
        # N = 8, and the r4 fallback of 256 was measured 1.7x SLOWER than
        # 512 on v5e (r5 A/B: 35.1 ms vs 62.3 at the aerosol-16str shape)
        TB = min(TB, 512)
    # the TPU lowering wants the sublane block dim divisible by 8 (or the
    # full axis): process CL layers per grid cell with an in-kernel loop
    CL = L if L < 8 else (chunk_l or 8)
    nchunk = pl.cdiv(L, CL)
    grid = (pl.cdiv(B, TB), nchunk)
    return TB, CL, nchunk, grid


def _bvp_forward(sol, ptop_p, ptop_m, pbot_p, pbot_m, ftop, bot_rhs,
                 albedo, ang, TB, CL, nchunk, grid, interpret):
    """Shared forward-elimination pass; returns (P, g) carries in HBM."""
    dtype = sol.lam.dtype
    N, L, B = sol.lam.shape
    wmu = tuple(float(x) for x in (ang.w * ang.mu))

    gp, gm, E = sol.gp, sol.gm, sol.expd
    d_up = jnp.concatenate(
        [(ptop_m[:, 0] - ftop)[:, None, :],
         ptop_m[:, 1:] - pbot_m[:, : L - 1]], axis=1)
    d_lo = jnp.concatenate(
        [ptop_p[:, 1:] - pbot_p[:, : L - 1],
         bot_rhs[:, None, :]], axis=1)
    dblk = jnp.concatenate([d_up, d_lo], axis=0)        # (2N, L, B)
    alb = albedo[None]                                  # (1, B)

    def im_nn(i, c):
        return (0, 0, c, i)

    def im_n(i, c):
        return (0, c, i)

    def im_b(i, c):
        return (0, i)

    return pl.pallas_call(
        functools.partial(_bvp_fwd_kernel, N=N, L=L, CL=CL, wmu=wmu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, N, CL, TB), im_nn, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N, CL, TB), im_nn, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, CL, TB), im_n, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * N, CL, TB), im_n, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), im_b, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2 * N, N, CL, TB), im_nn, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * N, CL, TB), im_n, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            _sds((2 * N, N, L, B), dtype, sol.lam),
            _sds((2 * N, L, B), dtype, sol.lam),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, 2 * N, TB), dtype),   # R carry
            pltpu.VMEM((2 * N, N, TB), dtype),   # P carry
            pltpu.VMEM((2 * N, TB), dtype),      # g carry
        ],
        interpret=interpret,
    )(gp, gm, E, dblk, alb)


def solve_bvp_pallas(sol, ptop_p, ptop_m, pbot_p, pbot_m, ftop, bot_rhs,
                     albedo, ang: StaticAngles,
                     *, block_b=1024, chunk_l=None, interpret=None):
    # block_b: 1024 measured fastest on v5e (18.5 ms vs 19.2 at 2048 for
    # the bench shape); 4096 exceeds the 16 MB VMEM scoped limit
    """Pallas implementation of ``solver.solve_bvp`` (same contract)."""
    dtype = sol.lam.dtype
    N, L, B = sol.lam.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    TB, CL, nchunk, grid = _bvp_tiles(N, L, B, block_b, chunk_l)
    Ps_hbm, gs_hbm = _bvp_forward(sol, ptop_p, ptop_m, pbot_p, pbot_m,
                                  ftop, bot_rhs, albedo, ang,
                                  TB, CL, nchunk, grid, interpret)
    gp, gm, E = sol.gp, sol.gm, sol.expd

    def rev_nn(i, j):
        return (0, 0, nchunk - 1 - j, i)

    def rev_n(i, j):
        return (0, nchunk - 1 - j, i)

    a, b = pl.pallas_call(
        functools.partial(_bvp_bwd_kernel, N=N, L=L, CL=CL, nchunk=nchunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, N, CL, TB), rev_nn, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N, CL, TB), rev_nn, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, CL, TB), rev_n, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * N, N, CL, TB), rev_nn, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * N, CL, TB), rev_n, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N, CL, TB), rev_n, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, CL, TB), rev_n, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            _sds((N, L, B), dtype, sol.lam),
            _sds((N, L, B), dtype, sol.lam),
        ],
        scratch_shapes=[pltpu.VMEM((N, TB), dtype)],
        interpret=interpret,
    )(gp, gm, E, Ps_hbm, gs_hbm)
    return a, b


def solve_bvp_flux_pallas(sol, ptop_p, ptop_m, pbot_p, pbot_m, ftop, bot_rhs,
                          albedo, ang: StaticAngles,
                          *, block_b=1024, chunk_l=None, interpret=None):
    """BVP solve with the level-flux contraction fused into the backward
    sweep (the ``onlyfl`` fast path).

    Returns ``(fl, fl_bot)``: ``fl`` is ``(2, L, B)`` — the wmu-weighted
    up/down intensity sums at every LAYER TOP (particular parts included;
    multiply by 2 pi for fluxes) — and ``fl_bot`` is ``(2, B)``, the same
    sums at the BOTTOM LEVEL, contracted in-kernel so the caller's
    epilogue depends only on kernel outputs (otherwise XLA rematerializes
    the entire upstream eigen/particular graph to avoid carrying the
    multi-GB gp/gm live set across this call — measured 2x step time at
    nstr = 16).  Skipping the (N, L, B) a/b outputs and the separate XLA
    flux pass saves two full reads of gp/gm plus the a/b round-trip.
    """
    dtype = sol.lam.dtype
    N, L, B = sol.lam.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    TB, CL, nchunk, grid = _bvp_tiles(N, L, B, block_b, chunk_l)
    Ps_hbm, gs_hbm = _bvp_forward(sol, ptop_p, ptop_m, pbot_p, pbot_m,
                                  ftop, bot_rhs, albedo, ang,
                                  TB, CL, nchunk, grid, interpret)
    gp, gm, E = sol.gp, sol.gm, sol.expd
    wmu = tuple(float(x) for x in (ang.w * ang.mu))

    def rev_nn(i, j):
        return (0, 0, nchunk - 1 - j, i)

    def rev_n(i, j):
        return (0, nchunk - 1 - j, i)

    def im_ab(i, j):
        return (0, i)

    fl, fl_bot = pl.pallas_call(
        functools.partial(_bvp_bwd_flux_kernel, N=N, L=L, CL=CL,
                          nchunk=nchunk, wmu=wmu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, N, CL, TB), rev_nn, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N, CL, TB), rev_nn, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, CL, TB), rev_n, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * N, N, CL, TB), rev_nn, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * N, CL, TB), rev_n, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, CL, TB), rev_n, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, CL, TB), rev_n, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, TB), im_ab, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, TB), im_ab, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2, CL, TB), rev_n, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, TB), im_ab, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            _sds((2, L, B), dtype, sol.lam),
            _sds((2, B), dtype, sol.lam),
        ],
        scratch_shapes=[pltpu.VMEM((N, TB), dtype)],
        interpret=interpret,
    )(gp, gm, E, Ps_hbm, gs_hbm, ptop_p, ptop_m,
      pbot_p[:, -1], pbot_m[:, -1])
    # without this barrier XLA has been observed to DUPLICATE the whole
    # upstream chain (stage-1 + particulars + both BVP kernels) once per
    # downstream consumer of the two outputs — 2x step time at nstr = 16
    # (r5 measurement); the barrier pins a single execution
    fl, fl_bot = jax.lax.optimization_barrier((fl, fl_bot))
    return fl, fl_bot
