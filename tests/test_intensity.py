"""Radiance (user-angle intensity) validation.

Covers the API surface the reference exercises through pydisort's
``usrang/usrtau/get_rad`` (``/root/reference/tests/test_disort.cpp:25-27,52``)
with numeric assertions:

* at quadrature angles the source-function integration must reproduce the
  node solution exactly (same ODE, closed-form integration);
* azimuthal modes m > 0 are checked against the dense numpy oracle solved
  per-mode;
* the optically thin limit must approach exact single scattering including
  its azimuthal dependence.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from numpy.polynomial.legendre import legval

from pyharp_tpu.rt.disort.disort import Disort, DisortOptions
from tests.oracle.dense_bvp import solve_dense


def build(nlyr=3, nstr=8, nmom=None, flags="lamber,quiet,usrang",
          user_mu=(), user_phi=(), user_tau=()):
    op = DisortOptions(flags=flags, nwave=1, ncol=1, nlyr=nlyr, nstr=nstr,
                       nmom=nmom or nstr, user_mu=user_mu, user_phi=user_phi,
                       user_tau=user_tau)
    return Disort(op)


def single_column_prop(dtau, ssa, moments=None):
    nlyr = len(dtau)
    nmom = 0 if moments is None else moments.shape[1] - 1
    prop = np.zeros((1, 1, nlyr, 2 + nmom))
    prop[0, 0, :, 0] = dtau[::-1]
    prop[0, 0, :, 1] = np.asarray(ssa)[::-1]
    if nmom:
        prop[0, 0, :, 2:] = moments[::-1, 1:]
    return jnp.asarray(prop)


def test_node_angle_consistency():
    """At quadrature angles the sweep equals the node expansion exactly."""
    dtau = np.array([0.2, 0.5, 1.0])
    ssa = np.array([0.7, 0.7, 0.7])
    mom = np.zeros((3, 2)); mom[:, 0] = 1.0; mom[:, 1] = 0.3
    ds = build()
    bc = dict(fbeam=jnp.full((1, 1), np.pi), umu0=jnp.full((1, 1), 0.6),
              albedo=jnp.full((1, 1), 0.3))
    out = ds.intensities(single_column_prop(dtau, ssa, mom), bc)
    uum = np.asarray(out["uum"])          # (nmode, 1, 1, ntau, numu)
    up_nodes = np.asarray(ds._last["up_all"])   # (N, L+1, B)
    dn_nodes = np.asarray(ds._last["dn_all"])
    mus = out["user_mu"]
    node_mu = list(np.round(ds._ang0.mu, 12))
    for i_mu, mu_u in enumerate(mus):
        got = uum[0, 0, 0, :, i_mu]
        j = node_mu.index(round(abs(mu_u), 12))
        want = (up_nodes if mu_u > 0 else dn_nodes)[j, :, 0]
        np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("mode", [1, 2, 3])
def test_higher_modes_vs_dense_oracle(mode):
    """m > 0 node solutions match the per-mode dense oracle."""
    dtau = np.array([0.3, 0.8])
    ssa = np.array([0.85, 0.5])
    g = 0.6
    nstr = 8
    ls = np.arange(nstr)
    mom = np.stack([g**ls, g**ls])
    ds = build(nlyr=2, nstr=nstr)
    mu0 = 0.55
    bc = dict(fbeam=jnp.full((1, 1), 2.0), umu0=jnp.full((1, 1), mu0),
              albedo=jnp.zeros((1, 1)))
    out = ds.intensities(single_column_prop(dtau, ssa, mom), bc)
    uum = np.asarray(out["uum"])          # (nmode, 1, 1, nlvl, numu)
    res = solve_dense(dtau, ssa, mom, n_half=nstr // 2, fbeam=2.0, mu0=mu0,
                      albedo=0.0, mode=mode)
    node_mu = list(np.round(res["mu"], 12))
    mus = out["user_mu"]
    for i_mu, mu_u in enumerate(mus):
        got = uum[mode, 0, 0, :, i_mu]
        j = node_mu.index(round(abs(mu_u), 12))
        want = (res["Iup"] if mu_u > 0 else res["Idn"])[:, j]
        np.testing.assert_allclose(got, want, rtol=2e-8, atol=1e-12,
                                   err_msg=f"mode={mode} mu={mu_u}")


def test_thin_layer_single_scattering_with_azimuth():
    """Optically thin layer: radiance -> exact single scattering, phi-resolved."""
    tau = 2e-4
    ssa_v = 0.9
    g = 0.5
    nstr = 8
    nmom = nstr - 1  # f = g_nstr = 0 -> no delta-M; single-scatter limit is
                     # then exact for the truncated phase at any nstr
    ls = np.arange(1, nmom + 1)
    mom = np.concatenate([[1.0], g**ls])[None, :]
    mu0 = 0.7
    f0 = np.pi
    user_mu = (0.35, 0.8)
    user_phi = (0.0, np.pi / 3, np.pi)
    ds = build(nlyr=1, nstr=nstr, nmom=nmom,
               user_mu=user_mu, user_phi=user_phi,
               flags="lamber,quiet,usrang")
    bc = dict(fbeam=jnp.full((1, 1), f0), umu0=jnp.full((1, 1), mu0),
              albedo=jnp.zeros((1, 1)))
    out = ds.intensities(single_column_prop(np.array([tau]),
                                            np.array([ssa_v]), mom), bc)
    uu = np.asarray(out["uu"])  # (1, 1, ntau=2, nphi, numu)

    def hg_phase(cos_t):
        # from the truncated moment set (what the solver represents)
        coef = (2 * np.arange(nmom + 1) + 1) * np.concatenate([[1.0], g**ls])
        return sum(c * legval(cos_t, np.eye(nmom + 1)[l])
                   for l, c in enumerate(coef))

    for ip, phi in enumerate(user_phi):
        for im, mu in enumerate(user_mu):
            # upward radiance at TOA (tau level 0)
            got = uu[0, 0, 0, ip, im]
            cos_t = -mu * mu0 + np.sqrt((1 - mu**2) * (1 - mu0**2)) * np.cos(phi)
            want = (ssa_v * f0 / (4 * np.pi) * hg_phase(cos_t)
                    * (1 - np.exp(-tau * (1 / mu + 1 / mu0)))
                    / (1 + mu / mu0))
            np.testing.assert_allclose(got, want, rtol=2e-3,
                                       err_msg=f"phi={phi} mu={mu}")


def test_isotropic_radiance_phi_independent():
    dtau = np.array([0.5])
    ssa = np.array([0.8])
    mom = np.ones((1, 1))
    ds = build(nlyr=1, user_mu=(0.5, -0.5), user_phi=(0.0, 1.0, 2.5))
    bc = dict(fbeam=jnp.full((1, 1), np.pi), umu0=jnp.full((1, 1), 0.6),
              albedo=jnp.full((1, 1), 0.2))
    out = ds.intensities(single_column_prop(dtau, ssa, mom), bc)
    uu = np.asarray(out["uu"])
    np.testing.assert_allclose(uu[..., 0, :], uu[..., 1, :], rtol=1e-10)
    np.testing.assert_allclose(uu[..., 0, :], uu[..., 2, :], rtol=1e-10)


def test_user_tau_matches_levels():
    """user_tau exactly at level depths reproduces level radiances."""
    dtau = np.array([0.4, 0.6])
    ssa = np.array([0.6, 0.6])
    mom = np.ones((2, 1))
    ds_lvl = build(nlyr=2, user_mu=(0.5, -0.7))
    bc = dict(fbeam=jnp.full((1, 1), np.pi), umu0=jnp.full((1, 1), 0.8),
              albedo=jnp.full((1, 1), 0.1))
    prop = single_column_prop(dtau, ssa, mom)
    out_lvl = ds_lvl.intensities(prop, bc)
    ds_tau = build(nlyr=2, user_mu=(0.5, -0.7), user_tau=(0.0, 0.4, 1.0),
                   flags="lamber,quiet,usrang,usrtau")
    out_tau = ds_tau.intensities(prop, bc)
    np.testing.assert_allclose(np.asarray(out_tau["uu"]),
                               np.asarray(out_lvl["uu"]), rtol=1e-10)


def test_flux_consistency_with_forward():
    """intensities() returns the same flux field as forward()."""
    dtau = np.array([0.3, 0.9])
    ssa = np.array([0.75, 0.4])
    mom = np.zeros((2, 2)); mom[:, 0] = 1.0; mom[:, 1] = 0.4
    prop = single_column_prop(dtau, ssa, mom)
    bc = dict(fbeam=jnp.full((1, 1), 2.0), umu0=jnp.full((1, 1), 0.5),
              albedo=jnp.full((1, 1), 0.3))
    ds = build(nlyr=2)
    f1 = np.asarray(ds.forward(prop, bc))
    out = ds.intensities(prop, bc)
    np.testing.assert_allclose(np.asarray(out["flux"]), f1, rtol=1e-12)


def test_user_tau_exact_in_thick_layer():
    """Mid-layer user_tau radiances are EXACT (closed-form in-layer source
    integration, not a linear blend): dense-oracle comparison at mid-layer
    depths of a dtau=5 layer (VERDICT r3 item 5 acceptance)."""
    dtau = np.array([5.0, 1.0])
    ssa = np.array([0.8, 0.6])
    g = 0.5
    nstr = 8
    ls = np.arange(nstr)          # nmom = nstr-1 -> f = 0, no delta-M:
    mom = np.stack([g**ls, g**ls])  # the oracle solves the unscaled system
    mu0, f0, alb = 0.6, np.pi, 0.3
    utaus = (0.0, 1.7, 2.5, 4.9, 5.0, 5.5, 6.0)
    ds = build(nlyr=2, nstr=nstr, nmom=nstr - 1,
               flags="lamber,quiet,usrang,usrtau", user_tau=utaus)
    bc = dict(fbeam=jnp.full((1, 1), f0), umu0=jnp.full((1, 1), mu0),
              albedo=jnp.full((1, 1), alb))
    out = ds.intensities(single_column_prop(dtau, ssa, mom), bc)
    uum = np.asarray(out["uum"])          # (nmode, 1, 1, ntau, numu)

    res = solve_dense(dtau, ssa, mom, n_half=nstr // 2, fbeam=f0, mu0=mu0,
                      albedo=alb, utaus=utaus)
    node_mu = list(np.round(res["mu"], 12))
    for i_mu, mu_u in enumerate(out["user_mu"]):
        got = uum[0, 0, 0, :, i_mu]
        j = node_mu.index(round(abs(mu_u), 12))
        want = (res["Iup_t"] if mu_u > 0 else res["Idn_t"])[:, j]
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-12,
                                   err_msg=f"mu={mu_u}")
