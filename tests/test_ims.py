"""IMS secondary-scattering correction (Nakajima-Tanaka 1988; DISORT SECSCA).

Validation strategy (no cdisort binary is available in this environment):

1. implementation check — ``ims_correction`` must equal an independent numpy
   quadrature of its defining double-scattering integral and spike series;
2. physics check — for a strongly forward-peaked phase function, an 8-stream
   delta-M radiance corrected by TMS-IMS must be closer to a 32-stream
   high-order truth run (which resolves the full phase expansion and is
   itself validated against the dense oracle elsewhere) than the TMS-only
   field in the downward aureole region;
3. limits — IMS vanishes when delta-M truncates nothing and at the TOA.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest
from numpy.polynomial.legendre import legval

from pyharp_tpu.rt.disort.disort import Disort, DisortOptions
from pyharp_tpu.rt.disort import intensity as _intensity


def hg_moments(g, nmom):
    return g ** np.arange(nmom + 1)


def _prop(nlyr, dtau, ssa, moments):
    moments = np.atleast_2d(moments)      # (nlyr, nmom+1) incl. g_0
    nmom = moments.shape[1] - 1
    prop = np.zeros((1, 1, nlyr, 2 + nmom))
    prop[0, 0, :, 0] = dtau
    prop[0, 0, :, 1] = ssa
    prop[0, 0, :, 2:] = moments[:, 1:]
    return jnp.asarray(prop)


# ---------------------------------------------------------------------------
# 1. implementation vs independent quadrature
# ---------------------------------------------------------------------------

def test_ims_matches_numpy_quadrature():
    nlyr, nstr = 3, 8
    rng = np.random.default_rng(7)
    dtau = np.array([0.3, 0.5, 0.8])
    ssa = np.array([0.9, 0.85, 0.8])
    g = 0.85
    nmom = 24
    gmom = hg_moments(g, nmom)                     # incl. g_0 = 1
    f = gmom[nstr]                                 # delta-M: f = g_nstr
    mu_u, phi, phi0 = -0.72, 0.3, 0.0
    mu0, fbeam = 0.8, np.pi

    L, B = nlyr, 1
    g_uns = jnp.asarray(np.broadcast_to(gmom[None, :, None], (L, nmom + 1, B)))
    ssa_j = jnp.asarray(ssa[:, None])
    f_j = jnp.full((L, B), f)
    tau_j = jnp.asarray(dtau[:, None])
    taucum = jnp.asarray(
        np.concatenate([[0.0], np.cumsum(dtau)])[:, None])
    got = np.asarray(_intensity.ims_correction(
        mu_u, phi, g_uns, ssa_j, f_j, tau_j, taucum, nstr,
        jnp.full((B,), fbeam), jnp.full((B,), mu0), jnp.full((B,), phi0)))

    # independent evaluation
    u = -mu_u
    cs = np.concatenate([[0.0], np.cumsum(ssa * dtau)])
    fs = np.concatenate([[0.0], np.cumsum(ssa * dtau * f)])
    zt = np.concatenate([[0.0], np.cumsum(dtau)])
    cos_t = (-mu_u) * mu0 + np.sqrt(1 - mu_u ** 2) * np.sqrt(1 - mu0 ** 2) \
        * np.cos(phi0 - phi)
    want = np.zeros(nlyr + 1)
    for lvl in range(1, nlyr + 1):
        wbar = cs[lvl] / zt[lvl]
        fbar = fs[lvl] / cs[lvl]
        fw = fbar * wbar
        # spike series: ghat = 1 below nstr, vertically averaged above
        pspike = 0.0
        for k in range(nmom + 1):
            ghat = 1.0 if k < nstr else (
                np.sum(ssa[:lvl] * dtau[:lvl] * gmom[k]) / fs[lvl])
            pk = legval(cos_t, np.eye(nmom + 1)[k])
            pspike += (2 * k + 1) * (2 * ghat - ghat ** 2) * pk
        mu0p = mu0 / (1.0 - fw)
        # brute-force chi integral
        t = np.linspace(0, zt[lvl], 20001)
        integ = t * np.exp(-t / mu0p) * np.exp(-(zt[lvl] - t) / u)
        chi = np.trapezoid(integ, t) / (u * mu0p)
        want[lvl] = fbeam / (4 * np.pi) * fw ** 2 / (1 - fw) * pspike * chi
    np.testing.assert_allclose(got[:, 0], want, rtol=2e-5, atol=1e-12)


def test_ims_zero_without_truncation_and_at_toa():
    L, B, nstr = 2, 1, 8
    g_uns = jnp.ones((L, 1, B))
    args = (jnp.full((L, B), 0.9), jnp.zeros((L, B)),   # ssa, f_dm = 0
            jnp.full((L, B), 0.5),
            jnp.asarray(np.array([[0.0], [0.5], [1.0]])), nstr,
            jnp.full((B,), np.pi), jnp.full((B,), 0.7), jnp.zeros((B,)))
    out = np.asarray(_intensity.ims_correction(-0.6, 0.0, g_uns, *args))
    assert np.all(out == 0.0)
    with pytest.raises(ValueError):
        _intensity.ims_correction(0.6, 0.0, g_uns, *args)


# ---------------------------------------------------------------------------
# 2. end-to-end: corrected 8-stream vs 32-stream truth in the aureole
# ---------------------------------------------------------------------------

def _radiance(nstr, nmom, flags, dtau, ssa, moments, user_mu, deltam=True):
    nlyr = len(dtau)
    op = DisortOptions(flags=flags, nwave=1, ncol=1, nlyr=nlyr, nstr=nstr,
                       nmom=nmom, user_mu=user_mu, user_phi=(0.0,),
                       deltam=deltam)
    ds = Disort(op)
    bc = dict(fbeam=jnp.full((1, 1), np.pi), umu0=jnp.full((1, 1), 0.8),
              albedo=jnp.zeros((1, 1)))
    # prop is bottom-up; uniform layers so orientation is immaterial here
    out = ds.intensities(_prop(nlyr, dtau, ssa, moments), bc)
    return np.asarray(out["uu"]), out["user_mu"]


def test_corrected_closer_to_high_order_truth():
    # g = 0.7: f = g^16 ~ 3e-3 at 16 streams, so the 16-stream run resolves
    # the phase expansion essentially exactly; at 8 streams f = g^8 ~ 0.058
    # and delta-M truncation is significant.
    g, nmom = 0.7, 16
    dtau = np.full(4, 0.25)
    ssa = np.full(4, 0.9)
    mom = np.broadcast_to(hg_moments(g, nmom), (4, nmom + 1)).copy()
    aureole_mu = (-0.8, -0.6)            # downward, near and off the beam

    # 16-stream reference radiances at the bottom level for the two aureole
    # angles, computed ONCE with this suite's own solver (f64 CPU):
    #   truth, _ = _radiance(16, nmom, "lamber,quiet,usrang",
    #                        dtau, ssa, mom, aureole_mu)
    #   truth[0, 0, -1, 0, :]
    # Frozen because the 16-mode unrolled radiance graph costs ~10 minutes
    # of XLA:CPU compile — by far the suite's most expensive single test —
    # while the values are deterministic to ~1e-12 across runs.  At g^16 ~
    # 3e-3 the 16-stream run resolves the phase expansion essentially
    # exactly, so these stand in for the exact radiances to ~1-2%.
    truth_bot = np.array([1.7892389458112783, 1.2206793934981326])
    if os.environ.get("PYHARP_REGEN_TRUTH"):
        # drift detector (ADVICE r4): regenerate the frozen reference from
        # the live 16-stream solve —
        #   PYHARP_REGEN_TRUTH=1 pytest tests/test_ims.py -k truth
        # (~10 min XLA:CPU compile) and compare against the constants.
        live, _ = _radiance(16, nmom, "lamber,quiet,usrang",
                            dtau, ssa, mom, aureole_mu)
        live_bot = live[0, 0, -1, 0, :]
        np.testing.assert_allclose(
            live_bot, truth_bot, rtol=1e-6,
            err_msg="frozen 16-stream truth has drifted; refresh truth_bot")

    plain, _ = _radiance(8, nmom, "lamber,quiet,usrang", dtau, ssa, mom,
                         aureole_mu)
    corr, _ = _radiance(8, nmom, "lamber,quiet,usrang,intensity_correction",
                        dtau, ssa, mom, aureole_mu)

    # bottom level (max path; uu is (nwave, ncol, ntau, nphi, numu) with
    # ntau top-down, so the bottom is ntau = -1), both aureole angles:
    # the correction must remove >= 75% of the delta-M truncation error and
    # land within 5% of the 16-stream truth (which carries a ~1-2% error of
    # its own at the aureole peak, so a tighter bound would test the truth
    # run, not the correction)
    for i_mu in range(len(aureole_mu)):
        e_plain = abs(plain[0, 0, -1, 0, i_mu] - truth_bot[i_mu])
        e_corr = abs(corr[0, 0, -1, 0, i_mu] - truth_bot[i_mu])
        assert e_corr < 0.25 * e_plain, (i_mu, e_corr, e_plain)
        assert e_corr < 0.05 * abs(truth_bot[i_mu])
