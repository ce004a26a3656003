"""Pseudo-spherical beam (spher), general_source, and ibcnd special mode.

These are the cdisort capabilities the reference exposes through pydisort's
flag string (SURVEY.md section 2.1: `spher`, `general_source`, `ibcnd`)
beyond the aMars examples' plain plane-parallel configuration.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pyharp_tpu.rt.disort.disort import Disort, DisortOptions
from pyharp_tpu.rt.disort.spherical import chapman_cumulative, effective_mu
from pyharp_tpu.rt.disort.quadrature import gauss_half_range


def _prop(nlyr, dtau, ssa, g=None, nstr=8):
    nmom = nstr if g is not None else 0
    prop = np.zeros((1, 1, nlyr, 2 + nmom))
    prop[0, 0, :, 0] = dtau
    prop[0, 0, :, 1] = ssa
    if g is not None:
        prop[0, 0, :, 2:] = g ** np.arange(1, nmom + 1)
    return jnp.asarray(prop)


# ---------------------------------------------------------------------------
# Chapman geometry
# ---------------------------------------------------------------------------

def test_chapman_plane_parallel_limit():
    # radius >> atmosphere depth: slant depth -> taucum / mu0 exactly
    L, B = 5, 3
    rng = np.random.default_rng(0)
    dtau = jnp.asarray(rng.uniform(0.05, 0.4, (L, B)))
    h = jnp.asarray(np.linspace(50.0, 0.0, L + 1)[:, None]
                    * np.ones((1, B)))          # top-down altitudes [km]
    radius = jnp.full((B,), 6.4e7)              # effectively flat
    umu0 = jnp.asarray([0.3, 0.6, 0.9])
    ch = chapman_cumulative(dtau, h, radius, umu0)
    taucum = jnp.concatenate([jnp.zeros((1, B)), jnp.cumsum(dtau, 0)], 0)
    np.testing.assert_allclose(np.asarray(ch), np.asarray(taucum / umu0),
                               rtol=1e-5)
    mu_eff = effective_mu(dtau, ch)
    np.testing.assert_allclose(np.asarray(mu_eff),
                               np.broadcast_to(np.asarray(umu0), (L, B)),
                               rtol=1e-5)


def test_chapman_curvature_shortens_slant_path():
    # strong curvature: slant path through shells is shorter than the
    # plane-parallel secant for oblique sun, so ch < taucum / mu0
    L, B = 4, 1
    dtau = jnp.full((L, B), 0.5)
    h = jnp.asarray(np.linspace(40.0, 0.0, L + 1)[:, None])
    radius = jnp.full((B,), 100.0)              # radius ~ atmosphere depth
    umu0 = jnp.asarray([0.2])
    ch = chapman_cumulative(dtau, h, radius, umu0)
    taucum = jnp.concatenate([jnp.zeros((1, B)), jnp.cumsum(dtau, 0)], 0)
    assert np.all(np.asarray(ch[1:]) < np.asarray(taucum[1:] / umu0) + 1e-12)
    assert np.all(np.asarray(ch[1:]) > np.asarray(taucum[1:]))  # still slant


def test_spher_flag_matches_plane_parallel_at_large_radius():
    nlyr, nstr = 6, 8
    dtau = np.full(nlyr, 0.3)
    prop = _prop(nlyr, dtau, 0.7, g=0.5, nstr=nstr)
    bc = dict(fbeam=jnp.full((1, 1), np.pi), umu0=jnp.full((1, 1), 0.5),
              albedo=jnp.full((1, 1), 0.2))
    op = DisortOptions(flags="lamber,quiet,onlyfl", nwave=1, ncol=1,
                       nlyr=nlyr, nstr=nstr, nmom=nstr)
    flat = Disort(op).forward(prop, bc)

    bc_s = dict(bc, h_lev=jnp.asarray(np.linspace(0.0, 60.0, nlyr + 1)[None]),
                radius=jnp.asarray(6.4e7))
    sph = Disort(op.replace(flags="lamber,quiet,onlyfl,spher")).forward(
        prop, bc_s)
    np.testing.assert_allclose(np.asarray(sph), np.asarray(flat),
                               rtol=2e-5, atol=1e-7)


def test_spher_flag_requires_geometry():
    op = DisortOptions(flags="lamber,quiet,onlyfl,spher", nwave=1, ncol=1,
                       nlyr=2, nstr=4, nmom=4)
    prop = _prop(2, np.array([0.1, 0.1]), 0.0, nstr=4)
    with pytest.raises(ValueError, match="spher"):
        Disort(op).forward(prop, dict(fbeam=jnp.ones((1, 1)),
                                      umu0=jnp.full((1, 1), 0.5)))


def test_spher_increases_oblique_surface_direct_beam():
    # curvature shortens the oblique slant path -> more direct flux reaches
    # the surface than in the plane-parallel secant approximation
    nlyr, nstr = 8, 8
    dtau = np.full(nlyr, 0.25)
    prop = _prop(nlyr, dtau, 0.0, nstr=nstr)
    bc = dict(fbeam=jnp.full((1, 1), np.pi), umu0=jnp.full((1, 1), 0.15),
              albedo=jnp.zeros((1, 1)),
              h_lev=jnp.asarray(np.linspace(0.0, 80.0, nlyr + 1)[None]),
              radius=jnp.asarray(300.0))
    op = DisortOptions(flags="lamber,quiet,onlyfl", nwave=1, ncol=1,
                       nlyr=nlyr, nstr=nstr, nmom=nstr)
    flat = Disort(op).forward(prop, bc)
    sph = Disort(op.replace(flags="lamber,quiet,onlyfl,spher")).forward(
        prop, bc)
    # surface (level 0, bottom-up) total downward flux
    assert float(sph[0, 0, 0, 1]) > float(flat[0, 0, 0, 1]) * 1.5


# ---------------------------------------------------------------------------
# general_source
# ---------------------------------------------------------------------------

def test_general_source_no_scattering_analytic():
    # ssa = 0: the RTE is a pure transmission problem and the constant
    # general source q gives I_up(TOA, mu_i) = q (1 - e^{-tau_tot / mu_i})
    nlyr, nstr = 5, 8
    N = nstr // 2
    dtau = np.full(nlyr, 0.4)
    tau_tot = dtau.sum()
    q = 0.37
    prop = _prop(nlyr, dtau, 0.0, nstr=nstr)
    gensrc = jnp.full((1, 1, nlyr, nstr), q)
    bc = dict(fbeam=jnp.zeros((1, 1)), umu0=jnp.full((1, 1), 0.5),
              albedo=jnp.zeros((1, 1)), gensrc=gensrc)
    op = DisortOptions(flags="lamber,quiet,onlyfl,general_source",
                       nwave=1, ncol=1, nlyr=nlyr, nstr=nstr, nmom=nstr)
    flux = np.asarray(Disort(op).forward(prop, bc))     # bottom-up levels

    mu, w = gauss_half_range(nstr)
    want_up_toa = 2 * np.pi * np.sum(w * mu * q * (1 - np.exp(-tau_tot / mu)))
    want_dn_srf = want_up_toa                            # symmetric problem
    np.testing.assert_allclose(flux[0, 0, -1, 0], want_up_toa, rtol=1e-5)
    np.testing.assert_allclose(flux[0, 0, 0, 1], want_dn_srf, rtol=1e-5)


def test_general_source_equals_thermal_when_isotropic():
    # a gray isotropic general source q = (1 - w0) B must reproduce the
    # planck path with constant level temperatures (slope = 0)
    nlyr, nstr = 4, 8
    dtau = np.full(nlyr, 0.5)
    ssa = 0.3
    prop = _prop(nlyr, dtau, ssa, nstr=nstr)

    from pyharp_tpu.rt.disort.planck import planck_total
    T = 260.0
    B_pl = float(planck_total(jnp.asarray(T)))
    gensrc = jnp.full((1, 1, nlyr, nstr), (1 - ssa) * B_pl)
    bc0 = dict(fbeam=jnp.zeros((1, 1)), umu0=jnp.full((1, 1), 0.5),
               albedo=jnp.zeros((1, 1)), btemp=jnp.zeros((1, 1)))
    op_g = DisortOptions(flags="lamber,quiet,onlyfl,general_source",
                         nwave=1, ncol=1, nlyr=nlyr, nstr=nstr, nmom=nstr)
    got = np.asarray(Disort(op_g).forward(prop, dict(bc0, gensrc=gensrc)))

    op_t = DisortOptions(flags="lamber,quiet,onlyfl,planck",
                         nwave=1, ncol=1, nlyr=nlyr, nstr=nstr, nmom=nstr)
    temf = jnp.full((1, nlyr + 1), T)
    want = np.asarray(Disort(op_t).forward(prop, bc0, temf))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)


# ---------------------------------------------------------------------------
# ibcnd (albedo / transmissivity of the medium)
# ---------------------------------------------------------------------------

def test_ibcnd_energy_conservation():
    # conservative scattering, black surface: albmed + trnmed = 1 per angle
    nlyr, nstr = 4, 8
    dtau = np.full(nlyr, 0.5)
    prop = _prop(nlyr, dtau, 1.0, g=0.3, nstr=nstr)   # ssa -> dithered to 1-
    op = DisortOptions(flags="lamber,quiet,ibcnd", nwave=1, ncol=1,
                       nlyr=nlyr, nstr=nstr, nmom=nstr,
                       user_mu=(0.2, 0.5, 0.9))
    out = Disort(op).albedo_transmissivity(prop)
    tot = np.asarray(out["albmed"] + out["trnmed"])[0, 0]
    np.testing.assert_allclose(tot, 1.0, atol=5e-4)


def test_ibcnd_absorbing_medium():
    # pure absorption: albmed = 0, trnmed = direct transmission exactly
    nlyr, nstr = 3, 8
    dtau = np.full(nlyr, 0.4)
    prop = _prop(nlyr, dtau, 0.0, nstr=nstr)
    mus = (0.3, 0.7)
    op = DisortOptions(flags="lamber,quiet,ibcnd", nwave=1, ncol=1,
                       nlyr=nlyr, nstr=nstr, nmom=nstr, user_mu=mus)
    out = Disort(op).albedo_transmissivity(prop)
    np.testing.assert_allclose(np.asarray(out["albmed"]), 0.0, atol=1e-8)
    want = np.exp(-dtau.sum() / np.asarray(mus))
    np.testing.assert_allclose(np.asarray(out["trnmed"])[0, 0], want,
                               rtol=1e-6)


def test_ibcnd_requires_positive_mu():
    op = DisortOptions(flags="lamber,quiet,ibcnd", nwave=1, ncol=1,
                       nlyr=2, nstr=4, nmom=4, user_mu=(-0.5, 0.5))
    prop = _prop(2, np.array([0.1, 0.1]), 0.0, nstr=4)
    with pytest.raises(ValueError, match="user_mu"):
        Disort(op).albedo_transmissivity(prop)


# ---------------------------------------------------------------------------
# eager-only accessors (VERDICT r3 weak item 3: no tracer leaks)
# ---------------------------------------------------------------------------

def test_accessors_raise_cleanly_under_jit_and_work_eagerly():
    import jax

    ds = Disort(DisortOptions(flags="lamber,quiet,onlyfl", nstr=4, nmom=4))
    prop = _prop(3, 0.5, 0.4, g=0.2, nstr=4)
    bc = dict(fbeam=jnp.ones((1, 1)), umu0=jnp.full((1, 1), 0.7),
              albedo=jnp.zeros((1, 1)))

    flux_jit = jax.jit(ds.forward)(prop, bc)
    assert np.all(np.isfinite(np.asarray(flux_jit)))
    with pytest.raises(RuntimeError, match="jit"):
        ds.fluxes()

    flux = ds.forward(prop, bc)
    flup, rfldn, rfldir = ds.fluxes()
    np.testing.assert_allclose(np.asarray(flux_jit), np.asarray(flux),
                               rtol=1e-6, atol=1e-12)
    assert np.all(np.isfinite(np.asarray(flup)))
