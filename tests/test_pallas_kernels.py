"""Pallas kernel path vs the pure-XLA solver (interpret mode on CPU).

The TPU production path (``DisortOptions.kernel="auto"``) routes the
eigensolve/thermal stage and the BVP elimination through the fused Pallas
kernels; these tests pin the two implementations together on small
problems via the Pallas interpreter.  (Full-scale numerical agreement on
real TPU hardware is exercised by the examples/bench; the interpreter
compile cost limits CPU coverage to nstr = 4.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyharp_tpu.rt.disort import solver as S
from pyharp_tpu.rt.disort import pallas_kernels as PK


def _problem(nstr=4, L=6, B=8, seed=0, dtype=jnp.float32):
    ang = S.make_static_angles(nstr, nstr, 0)
    rng = np.random.default_rng(seed)
    ssa = jnp.asarray(rng.uniform(0.0, 0.95, (L, B)), dtype)
    pmom = jnp.asarray(rng.uniform(-0.2, 0.8, (L, nstr, B)), dtype)
    dtau = jnp.asarray(rng.uniform(0.001, 2.0, (L, B)), dtype)
    btop = jnp.asarray(rng.uniform(0.0, 1.0, (L, B)), dtype)
    slope = jnp.asarray(rng.uniform(-0.2, 0.2, (L, B)), dtype)
    return ang, ssa, pmom, dtau, btop, slope


def test_stage1_matches_xla():
    ang, ssa, pmom, dtau, btop, slope = _problem()
    sol, V, U = S.homogeneous_solution(ssa, pmom, dtau, ang)
    y0p, y0m, y1 = S.thermal_particular(V, U, ssa, btop, slope, ang)

    gp, gm, lam, expd, ky0p, ky0m, ky1 = PK.fused_homogeneous_thermal(
        ssa, pmom, dtau, btop, slope, ang, block=(8, 8), interpret=True)

    # same rotation schedule -> same mode ordering: compare directly
    for got, want in [(lam, sol.lam), (gp, sol.gp), (gm, sol.gm),
                      (expd, sol.expd), (ky0p, y0p), (ky0m, y0m),
                      (ky1, y1)]:
        err = np.max(np.abs(np.asarray(got) - np.asarray(want)))
        scale = max(np.max(np.abs(np.asarray(want))), 1e-30)
        assert err / scale < 3e-5


def test_stage1_thermal_off_returns_zero_particular():
    ang, ssa, pmom, dtau, btop, slope = _problem()
    *_, y0p, y0m, y1 = PK.fused_homogeneous_thermal(
        ssa, pmom, dtau, btop, slope, ang, block=(8, 8), interpret=True,
        thermal=False)
    assert np.all(np.asarray(y0p) == 0.0)
    assert np.all(np.asarray(y1) == 0.0)


def test_bvp_matches_xla():
    # L = 11 is deliberately NOT a multiple of the in-kernel chunk so the
    # padded-sublayer masking in the backward sweep is exercised
    ang, ssa, pmom, dtau, btop, slope = _problem(nstr=4, L=11, B=8, seed=1)
    N = 2
    sol, V, U = S.homogeneous_solution(ssa, pmom, dtau, ang)
    y0p, y0m, y1 = S.thermal_particular(V, U, ssa, btop, slope, ang)
    args = (sol, y0p, y0m, y0p + y1 * dtau[None], y0m + y1 * dtau[None],
            jnp.zeros((N, 8), jnp.float32), jnp.ones((N, 8), jnp.float32),
            jnp.full((8,), 0.3, jnp.float32), ang)
    a0, b0 = S.solve_bvp(*args)
    a1, b1 = PK.solve_bvp_pallas(*args, block_b=8, interpret=True)
    scale = max(float(jnp.max(jnp.abs(a0))), 1e-30)
    assert float(jnp.max(jnp.abs(a0 - a1))) / scale < 3e-5
    assert float(jnp.max(jnp.abs(b0 - b1))) / scale < 3e-5


def test_bvp_flux_fused_matches_xla_forward():
    """The flux-fused backward sweep must reproduce the full XLA forward's
    level fluxes exactly (interpret mode; L=11 exercises padded chunks)."""
    from pyharp_tpu.rt.disort.disort import Disort, DisortOptions

    nstr, L, B = 4, 11, 8
    rng = np.random.default_rng(5)
    prop = np.zeros((2, 4, L, 2 + nstr))
    prop[..., 0] = rng.uniform(0.01, 1.5, (2, 4, L))
    prop[..., 1] = rng.uniform(0.1, 0.9, (2, 4, L))
    prop[..., 2:] = 0.5 ** np.arange(1, nstr + 1)
    prop = jnp.asarray(prop, jnp.float32)
    bc = dict(fbeam=jnp.full((2, 4), np.pi, jnp.float32),
              umu0=jnp.full((2, 4), 0.6, jnp.float32),
              albedo=jnp.full((2, 4), 0.3, jnp.float32),
              btemp=jnp.full((2, 4), 290.0, jnp.float32))
    temf = jnp.asarray(np.broadcast_to(np.linspace(220.0, 280.0, L + 1),
                                       (4, L + 1)).copy(), jnp.float32)

    def run(kernel):
        ds = Disort(DisortOptions(
            flags="lamber,quiet,onlyfl,planck", nwave=2, ncol=4, nlyr=L,
            nstr=nstr, nmom=nstr, wave_lower=(1.0,) * 2,
            wave_upper=(500.0,) * 2, kernel=kernel))
        return np.asarray(ds.forward(prop, bc, temf))

    f_xla = run("xla")
    f_pal = run("pallas")   # interpret mode on CPU; uses the fused flux path
    scale = np.abs(f_xla).max()
    np.testing.assert_allclose(f_pal, f_xla, atol=3e-5 * scale, rtol=3e-4)


def test_bvp_fused_single_pass_matches_two_kernel():
    """The single-pass fused BVP kernel (min-HBM-bytes formulation kept as
    the roofline's byte-floor evidence) must be bit-compatible with the
    production two-kernel path, in both output modes."""
    ang, ssa, pmom, dtau, btop, slope = _problem(nstr=4, L=11, B=8, seed=3)
    N = 2
    sol, V, U = S.homogeneous_solution(ssa, pmom, dtau, ang)
    y0p, y0m, y1 = S.thermal_particular(V, U, ssa, btop, slope, ang)
    args = (sol, y0p, y0m, y0p + y1 * dtau[None], y0m + y1 * dtau[None],
            jnp.zeros((N, 8), jnp.float32), jnp.ones((N, 8), jnp.float32),
            jnp.full((8,), 0.3, jnp.float32), ang)
    a0, b0 = PK.solve_bvp_pallas(*args, block_b=8, interpret=True)
    a1, b1 = PK.solve_bvp_fused(*args, flux_only=False, block_b=8,
                                interpret=True)
    scale = max(float(jnp.max(jnp.abs(a0))), 1e-30)
    assert float(jnp.max(jnp.abs(a0 - a1))) / scale < 3e-6
    assert float(jnp.max(jnp.abs(b0 - b1))) / scale < 3e-6

    fl0, flb0 = PK.solve_bvp_flux_pallas(*args, block_b=8, interpret=True)
    fl1, ab1 = PK.solve_bvp_fused(*args, flux_only=True, block_b=8,
                                  interpret=True)
    fscale = max(float(jnp.max(jnp.abs(fl0))), 1e-30)
    assert float(jnp.max(jnp.abs(fl0 - fl1))) / fscale < 3e-6
    # flux_pallas emits the bottom-LEVEL wmu-sums in-kernel; rebuild them
    # from the fused kernel's bottom (a, b) snapshot
    wmu = jnp.asarray(ang.w * ang.mu, jnp.float32)
    aL, bL = ab1[:N], ab1[N:]
    gpL, gmL, EL = sol.gp[:, :, -1], sol.gm[:, :, -1], sol.expd[:, -1]
    pbp = (y0p + y1 * dtau[None])[:, -1]
    pbm = (y0m + y1 * dtau[None])[:, -1]
    up_bot = jnp.einsum("ikb,kb->ib", gpL, EL * aL) \
        + jnp.einsum("ikb,kb->ib", gmL, bL) + pbp
    dn_bot = jnp.einsum("ikb,kb->ib", gmL, EL * aL) \
        + jnp.einsum("ikb,kb->ib", gpL, bL) + pbm
    want_bot = jnp.stack([jnp.einsum("i,ib->b", wmu, up_bot),
                          jnp.einsum("i,ib->b", wmu, dn_bot)])
    assert float(jnp.max(jnp.abs(flb0 - want_bot))) / fscale < 3e-6


def test_stage1_isotropic_secular_matches_xla():
    """The nmom=0 secular fast path must reproduce the XLA Jacobi path at
    the eigenvalue level (mode order differs: secular sorts ascending)."""
    ang, ssa, _, dtau, btop, slope = _problem(nstr=8, L=6, B=16, seed=4)
    pmom0 = jnp.zeros((6, 0, 16), jnp.float32)
    # include the edge cases: exact zero and near-conservative ssa
    ssa = ssa.at[0, 0].set(0.0).at[1, 1].set(0.999999)
    out = PK.fused_homogeneous_thermal(ssa, pmom0, dtau, btop, slope, ang,
                                       block=(8, 8), interpret=True)
    gp, gm, lam, expd, y0p, y0m, y1 = [np.asarray(x) for x in out]
    assert all(np.isfinite(x).all() for x in (gp, gm, lam, expd))
    sol, V, U = S.homogeneous_solution(ssa, pmom0, dtau, ang)
    lam_x = np.sort(np.asarray(sol.lam), axis=0)
    # atol covers the near-conservative edge (ssa -> 1: the smallest
    # eigenvalue approaches 0 and carries only absolute f32 accuracy in
    # BOTH methods)
    np.testing.assert_allclose(np.sort(lam, axis=0), lam_x,
                               rtol=2e-4, atol=5e-5)
    # closed-form isotropic thermal particular: y1 = slope,
    # y0p/m = btop -++ mu*slope
    mu = np.asarray(ang.mu)
    np.testing.assert_allclose(y1, np.broadcast_to(
        np.asarray(slope)[None], y1.shape), rtol=1e-6)
    want_y0p = (np.asarray(btop)[None]
                + mu[:, None, None] * np.asarray(slope)[None])
    np.testing.assert_allclose(y0p, want_y0p, rtol=1e-5, atol=1e-6)
