"""Third-party-class oracle parity: DISORT fluxes vs the compiled C Monte
Carlo transport and the exact Chandrasekhar H-function.

This is the BASELINE.md "flux RMSE vs cdisort" acceptance with the
available independent references (cdisort's C source is fetched from an
external repo at configure time and is absent from this checkout; the
environment has no network — see tests/oracle/mc.py).  The full
high-photon matrix is recorded in RMSE.md by bench/rmse_run.py; the CI
versions here use fewer photons and correspondingly looser bounds.

MC statistical error at 2e6 photons is ~1e-3 relative, so these bounds
test the solver's physics, not its last digits; the dense/SOS oracles
elsewhere pin tighter digits.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pyharp_tpu.rt.disort.disort import Disort, DisortOptions
from tests.oracle.mc import (mc_beam_flux, mc_isotropic_flux,
                             mc_thermal_flux)
from tests.oracle.hfunction import plane_albedo


def _hg_moments(g, nmom):
    return g ** np.arange(1, nmom + 1)


def _solve(dtau, ssa, g, albedo, bc_extra, nstr=16, flags="lamber,quiet,onlyfl",
           blev=None, bsurf=None):
    nlyr = len(dtau)
    nmom = nstr
    prop = np.zeros((1, 1, nlyr, 2 + nmom))
    prop[0, 0, :, 0] = dtau[::-1]                 # solver takes bottom-up
    prop[0, 0, :, 1] = ssa
    if g:
        prop[0, 0, :, 2:] = _hg_moments(g, nmom)[None, :]
    op = DisortOptions(flags=flags, nwave=1, ncol=1, nlyr=nlyr, nstr=nstr,
                       nmom=nmom)
    bc = dict(albedo=jnp.full((1, 1), float(albedo)), **bc_extra)
    temf = None
    if blev is not None:
        # solver wants level temperatures; drive Planck directly by using
        # planck_total with temperatures chosen so B(T) = blev: since
        # planck_total = sigma T^4 / pi, T = (pi B / sigma)^(1/4)
        from pyharp_tpu.core.constants import stefanBoltzmann as sig

        tlev = (np.pi * np.asarray(blev) / sig) ** 0.25
        temf = jnp.asarray(tlev[::-1][None, :])   # bottom-up levels
        bsurf_T = (np.pi * bsurf / sig) ** 0.25 if bsurf else 0.0
        bc["btemp"] = jnp.full((1, 1), float(bsurf_T))
        op = op.replace(flags=flags + ",planck")
    ds = Disort(op)
    flux = np.asarray(ds.forward(jnp.asarray(prop), bc, temf))[0, 0]
    # solver returns bottom-up levels; compare top-down
    return flux[::-1, 0], flux[::-1, 1]           # flup, fldn_total


def test_beam_fluxes_match_mc_hg():
    dtau = np.full(4, 0.5)
    ssa, g, albedo, mu0 = 0.9, 0.7, 0.2, 0.6
    up, dn = _solve(dtau, ssa, g, albedo,
                    dict(fbeam=jnp.full((1, 1), 1.0),
                         umu0=jnp.full((1, 1), mu0)), nstr=8)
    mup, mdn = mc_beam_flux(dtau, ssa, g, albedo, mu0, fbeam=1.0,
                            n_photons=4_000_000)
    scale = max(mdn.max(), mup.max())
    assert np.abs(up - mup).max() / scale < 5e-3
    assert np.abs(dn - mdn).max() / scale < 5e-3


def test_thermal_fluxes_match_mc():
    dtau = np.array([0.2, 0.6, 1.2, 2.0])
    ssa = 0.35
    blev = np.array([1.0, 1.4, 1.9, 2.3, 2.8])    # top-down Planck
    bsurf = 3.0
    albedo = 0.15
    up, dn = _solve(dtau, ssa, 0.0, albedo, {}, blev=blev, bsurf=bsurf,
                    nstr=8)
    mup, mdn = mc_thermal_flux(dtau, ssa, 0.0, albedo, blev, bsurf,
                               n_photons=4_000_000)
    scale = max(mup.max(), mdn.max())
    assert np.abs(up - mup).max() / scale < 5e-3
    assert np.abs(dn - mdn).max() / scale < 5e-3


def test_fisot_fluxes_match_mc():
    dtau = np.full(3, 0.8)
    ssa, albedo = 0.8, 0.3
    up, dn = _solve(dtau, ssa, 0.0, albedo,
                    dict(fisot=jnp.full((1, 1), 1.0)), nstr=8)
    mup, mdn = mc_isotropic_flux(dtau, ssa, 0.0, albedo, fisot=1.0,
                                 n_photons=4_000_000)
    scale = mdn.max()
    assert np.abs(up - mup).max() / scale < 5e-3
    assert np.abs(dn - mdn).max() / scale < 5e-3


def test_semi_infinite_plane_albedo_matches_chandrasekhar():
    """Deterministic exact anchor: thick isotropic atmosphere's TOA albedo
    equals 1 - sqrt(1-w0) H(mu0) to the solver's stream-convergence.

    All three (w0, mu0) cases run as one BATCHED solve (the case values
    are DATA, so XLA:CPU compiles the nstr=16 graph once, not per case).
    """
    cases = [(0.3, 0.5), (0.9, 0.8), (0.99, 0.2)]
    nlyr, nstr = 32, 16
    nmom = nstr
    prop = np.zeros((1, len(cases), nlyr, 2 + nmom))
    prop[..., 0] = 2.0                             # tau_total = 64
    for i, (w0, _) in enumerate(cases):
        prop[0, i, :, 1] = w0
    op = DisortOptions(flags="lamber,quiet,onlyfl", nwave=1,
                       ncol=len(cases), nlyr=nlyr, nstr=nstr, nmom=nmom)
    bc = dict(albedo=jnp.zeros((1, len(cases))),
              fbeam=jnp.ones((1, len(cases))),
              umu0=jnp.asarray([[mu0 for _, mu0 in cases]]))
    flux = np.asarray(Disort(op).forward(jnp.asarray(prop), bc))[0]
    for i, (w0, mu0) in enumerate(cases):
        got = flux[i, ::-1, 0][0] / mu0            # TOA up / incident
        want = plane_albedo(w0, mu0)
        assert abs(got - want) / want < 2e-3, (w0, mu0, got, want)
