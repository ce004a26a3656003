"""Radio (microwave) and Freedman-mean attenuators.

Physics-level checks for the absorber classes the legacy CANOE factory
enumerates (``absorber_factory.cpp_:116-139``): VVW line shape limits,
pressure/density scalings of the continua, and the Freedman fit's
qualitative behavior.  (The reference ships no implementations or golden
values for these classes — its factory names classes living in the host
model — so the tests pin the defining physical properties instead.)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pyharp_tpu.core import constants
from pyharp_tpu.opacity import AttenuatorOptions
from pyharp_tpu.opacity.freedman import FreedmanMean, FreedmanSimple
from pyharp_tpu.opacity.radio import (
    RadioVVWAbsorber, RadioCIA, RadioElectron, VVWLine, vvw_shape,
    load_vvw_lines)


def _opts(atype, files=()):
    return AttenuatorOptions(type=atype, opacity_files=files,
                             species_ids=(0,), species_names=("x",),
                             species_weights=(0.017,))


def _atm(ncol=1, nlyr=3, p=1e5, t=300.0, n=1.0):
    conc = jnp.full((ncol, nlyr, 1), n)
    pres = jnp.full((ncol, nlyr), p)
    temp = jnp.full((ncol, nlyr), t)
    return conc, pres, temp


# ---------------------------------------------------------------------------
# van Vleck-Weisskopf machinery
# ---------------------------------------------------------------------------

def test_vvw_shape_normalization_and_peak():
    # narrow line: integrates to ~1 over nu and peaks at the line center
    nu0, dnu = 100.0, 0.05
    nu = jnp.asarray(np.linspace(90.0, 110.0, 40001))
    f = np.asarray(vvw_shape(nu, nu0, jnp.asarray(dnu)))
    area = np.trapezoid(f, np.asarray(nu))
    np.testing.assert_allclose(area, 1.0, rtol=5e-3)
    assert abs(float(nu[np.argmax(f)]) - nu0) < 0.01


def test_vvw_lines_loaded_from_data():
    lines = load_vvw_lines("radio_nh3_lines.txt")
    assert len(lines) >= 4
    assert all(21.0 < ln.nu0 < 26.0 for ln in lines)  # 1.3 cm inversion band


def test_radio_vvw_peak_and_broadening():
    line = VVWLine(nu0=23.69, s300=1.0e-13, elow=22.7,
                   gamma_self=0.7, gamma_h2=2.6, gamma_he=0.75, n_t=0.67)
    ab = RadioVVWAbsorber(_opts("radio_nh3"), lines=(line,), dtype=jnp.float64)
    conc, pres, temp = _atm(n=1.0)
    nu = jnp.asarray([20.0, 23.69, 28.0])
    out = np.asarray(ab.forward(conc, pres=pres, temp=temp, frequency_ghz=nu))
    assert out.shape == (3, 1, 3, 1)
    assert np.all(out > 0)
    assert out[1, 0, 0, 0] > out[0, 0, 0, 0]  # peak at line center
    assert out[1, 0, 0, 0] > out[2, 0, 0, 0]

    # pressure broadening: at line center, higher P -> wider line -> LOWER
    # peak absorption per molecule
    _, pres_hi, _ = _atm(p=1e6)
    hi = np.asarray(ab.forward(conc, pres=pres_hi, temp=temp,
                               frequency_ghz=nu))
    assert hi[1, 0, 0, 0] < out[1, 0, 0, 0]
    # ... but higher in the far wing (offset >> both linewidths: dnu is
    # ~2.3 GHz at 1 bar and ~23 GHz at 10 bar, so probe at 80 GHz)
    far = jnp.asarray([80.0])
    w_lo = np.asarray(ab.forward(conc, pres=pres, temp=temp,
                                 frequency_ghz=far))
    w_hi = np.asarray(ab.forward(conc, pres=pres_hi, temp=temp,
                                 frequency_ghz=far))
    assert w_hi[0, 0, 0, 0] > w_lo[0, 0, 0, 0]


def test_radio_vvw_wavenumber_input():
    ab = RadioVVWAbsorber(_opts("radio_h2o", ("radio_h2o_lines.txt",)),
                          dtype=jnp.float64)
    conc, pres, temp = _atm()
    # 22.235 GHz in wavenumber: nu / c
    wn = jnp.asarray([22.2350800e9 / 2.99792458e10])   # 1/cm
    out = np.asarray(ab.forward(conc, pres=pres, temp=temp, wavenumber=wn))
    out2 = np.asarray(ab.forward(conc, pres=pres, temp=temp,
                                 frequency_ghz=jnp.asarray([22.2350800])))
    np.testing.assert_allclose(out, out2, rtol=1e-6)


def test_radio_cia_scalings():
    ab = RadioCIA(_opts("radio_cia"), dtype=jnp.float64)
    conc, pres, temp = _atm()
    nu = jnp.asarray([10.0, 20.0])
    a = np.asarray(ab.forward(conc, pres=pres, temp=temp, frequency_ghz=nu))
    # nu^2 law
    np.testing.assert_allclose(a[1] / a[0], 4.0, rtol=1e-6)
    # density-squared law: double the pressure -> 4x absorption
    _, p2, _ = _atm(p=2e5)
    a2 = np.asarray(ab.forward(conc, pres=p2, temp=temp, frequency_ghz=nu))
    np.testing.assert_allclose(a2 / a, 4.0, rtol=1e-6)
    # colder is more absorbing at fixed density: alpha ~ T^-t_exp with the
    # amagat densities fixed -> evaluate the T factor directly
    _, _, t2 = _atm(t=150.0)
    a3 = np.asarray(ab.forward(conc, pres=pres, temp=t2, frequency_ghz=nu))
    # n_tot doubles at half T (ideal gas at same P) AND (T/300)^-2.7 grows
    assert np.all(a3 > a)


def test_radio_electron_scalings():
    ab = RadioElectron(_opts("radio_electron"), dtype=jnp.float64)
    # low pressure (ionosphere): nu_c ~ k n_neutral sqrt(T) << GHz, so the
    # Drude form reduces to alpha ~ n_e nu_c / nu^2
    conc, pres, temp = _atm(n=1e12, p=0.01)  # electrons / m^3, 0.01 Pa
    nu = jnp.asarray([1.0, 2.0])
    a = np.asarray(ab.forward(conc, pres=pres, temp=temp, frequency_ghz=nu))
    assert np.all(a > 0)
    np.testing.assert_allclose(a[0] / a[1], 4.0, rtol=1e-3)
    # linear in n_e
    a2 = np.asarray(ab.forward(2.0 * conc, pres=pres, temp=temp,
                               frequency_ghz=nu))
    np.testing.assert_allclose(a2 / a, 2.0, rtol=1e-6)
    # collision-dominated regime (1 bar): frequency dependence flattens
    _, p_hi, _ = _atm(p=1e5)
    b = np.asarray(ab.forward(conc, pres=p_hi, temp=temp, frequency_ghz=nu))
    assert b[0, 0, 0, 0] / b[1, 0, 0, 0] < 1.1


# ---------------------------------------------------------------------------
# Freedman
# ---------------------------------------------------------------------------

def test_freedman_mean_behavior():
    ab = FreedmanMean(_opts("freedman_mean"), dtype=jnp.float64)
    conc, pres, temp = _atm(p=1e5, t=1000.0, n=1.0)
    out = np.asarray(ab.forward(conc, pres=pres, temp=temp))
    assert out.shape == (1, 1, 3, 1)
    assert np.all(out > 0) and np.all(np.isfinite(out))

    # kappa rises with pressure at fixed T (collision-induced + pressure
    # broadening dominate the high-P term)
    k1 = float(ab.kappa_cm2g(jnp.asarray(1e4), jnp.asarray(1000.0)))
    k2 = float(ab.kappa_cm2g(jnp.asarray(1e7), jnp.asarray(1000.0)))
    assert k2 > k1

    # metallicity increases opacity
    ab_met = FreedmanMean(_opts("freedman_mean"), met=0.5, dtype=jnp.float64)
    km = float(ab_met.kappa_cm2g(jnp.asarray(1e5), jnp.asarray(1500.0)))
    k0 = float(ab.kappa_cm2g(jnp.asarray(1e5), jnp.asarray(1500.0)))
    assert km > k0

    # the alkali rise above the ~1500 K opacity minimum (Freedman et al.
    # 2014 surface shape at 1 bar)
    kmid = float(ab.kappa_cm2g(jnp.asarray(1e5), jnp.asarray(1500.0)))
    kh = float(ab.kappa_cm2g(jnp.asarray(1e5), jnp.asarray(2500.0)))
    assert kh > 2.0 * kmid
    # sane magnitudes for solar-ish gas (order-of-magnitude envelope)
    assert 1e-4 < kmid < 1e0 and 1e-3 < kh < 1e1

    # custom kappa_fn override is used verbatim
    ab_fn = FreedmanMean(_opts("freedman_mean"),
                         kappa_fn=lambda p, t: jnp.full_like(t, 0.123),
                         dtype=jnp.float64)
    np.testing.assert_allclose(
        float(ab_fn.kappa_cm2g(jnp.asarray(1e5), jnp.asarray(1000.0))),
        0.123)


def test_freedman2014_reference_points():
    """Transcription regression of the Freedman et al. (2014) fit: values
    hand-evaluated from eqs. 3-5 + Table 2 at two (P, T) points (solar
    metallicity, 1 bar).  Guards against coefficient/formula slips."""
    from pyharp_tpu.opacity.freedman import freedman2014_kappa

    # T = 1000 K: low-P term 10^-4.2572 = 5.532e-5, high-P (hot set)
    # 10^-1.8574 = 1.3885e-2 -> 1.3940e-2 cm^2/g
    k1000 = float(freedman2014_kappa(jnp.asarray(1e5, jnp.float64),
                                     jnp.asarray(1000.0, jnp.float64)))
    np.testing.assert_allclose(k1000, 1.3940e-2, rtol=1e-3)

    # T = 300 K: low-P term 2.7e-10 (negligible), high-P (cold set)
    # 10^-1.6880 = 2.0512e-2 cm^2/g
    k300 = float(freedman2014_kappa(jnp.asarray(1e5, jnp.float64),
                                    jnp.asarray(300.0, jnp.float64)))
    np.testing.assert_allclose(k300, 2.0512e-2, rtol=1e-3)

    # metallicity raises both terms: +0.5 dex at 1000 K multiplies the
    # high-P term by 10^(0.8321*0.5*(0.5 + atan(0.5/0.2)/pi))
    k_met = float(freedman2014_kappa(jnp.asarray(1e5, jnp.float64),
                                     jnp.asarray(1000.0, jnp.float64),
                                     met=0.5))
    assert k_met > 1.8 * k1000


def test_freedman_simple_power_law():
    ab = FreedmanSimple(_opts("freedman_simple"), k0=1e-2, a=1.0, b=0.0,
                        dtype=jnp.float64)
    conc, pres, temp = _atm(p=1e5, t=300.0, n=2.0)
    out = np.asarray(ab.forward(conc, pres=pres, temp=temp))
    # kappa = k0 * (P/P0) = 1e-2; ext = kappa * conc * mw
    want = 1e-2 * 2.0 * 0.017
    np.testing.assert_allclose(out, want, rtol=1e-12)


def test_band_builds_radio_and_freedman():
    from pyharp_tpu.radiation.band import RadiationBand, RadiationBandOptions
    from pyharp_tpu.rt.disort.disort import DisortOptions

    bop = RadiationBandOptions(
        name="radio", solver_name="disort", nlyr=3, ncol=1,
        attenuators=(
            ("nh3", _opts("radio_nh3")),
            ("cia", _opts("radio_cia")),
            ("e", _opts("radio_electron")),
            ("gas", _opts("freedman_mean")),
        ),
        disort=DisortOptions(flags="lamber,quiet,onlyfl", nstr=4, nmom=4,
                             nwave=2, ncol=1, nlyr=3),
    )
    band = RadiationBand(bop, dtype=jnp.float64)
    assert set(band.attenuators) == {"nh3", "cia", "e", "gas"}


def test_nh3_line_weights_match_berge_gulkis_derivation():
    """The shipped NH3 S300 values must equal the Berge & Gulkis (1976)
    metastable weighting computed independently here (B0 = 298.117 GHz,
    C0 = 186.726 GHz, ortho g_s = 2 for K % 3 == 0), normalized to (3,3)."""
    from pyharp_tpu.opacity.radio import load_vvw_lines

    lines = load_vvw_lines("radio_nh3_lines.txt")
    assert len(lines) == 6
    B, C = 298.117, 186.726
    kb_ghz = 20.836619
    want = []
    for J, ln in zip(range(1, 7), lines):
        E_K = (B * J * (J + 1) + (C - B) * J * J) / kb_ghz
        gs = 2.0 if J % 3 == 0 else 1.0
        w = J * J / (J * (J + 1)) * (2 * J + 1) * gs * np.exp(-E_K / 300.0)
        want.append((w, E_K))
    w33 = want[2][0]
    for ln, (w, E_K) in zip(lines, want):
        np.testing.assert_allclose(ln.s300, w / w33 * 1e-13, rtol=2e-3)
        np.testing.assert_allclose(ln.elow, E_K, rtol=5e-3)


def test_freedman2014_low_pressure_guard():
    """The low-P term's pole at log10(P_cgs) = -c4 (P ~ 1.1e-4 Pa) must be
    guarded: opacities stay finite and positive down to vacuum pressures
    (r4 review finding), saturating at the clamped fit-domain edge."""
    from pyharp_tpu.opacity.freedman import freedman2014_kappa

    for p in (1e-3, 1.1e-4, 1e-5, 1e-12, 0.0):
        for t in (100.0, 1000.0, 3000.0):
            k = float(freedman2014_kappa(jnp.asarray(p, jnp.float64),
                                         jnp.asarray(t, jnp.float64)))
            assert np.isfinite(k) and k > 0, (p, t, k)
    # below the clamp everything saturates to the same value
    k1 = float(freedman2014_kappa(jnp.asarray(1e-2, jnp.float64),
                                  jnp.asarray(1000.0, jnp.float64)))
    k2 = float(freedman2014_kappa(jnp.asarray(1e-9, jnp.float64),
                                  jnp.asarray(1000.0, jnp.float64)))
    np.testing.assert_allclose(k1, k2, rtol=1e-12)


def test_h2o_h2s_ph3_lines_match_rotor_derivation():
    """The shipped H2O/H2S/PH3 S300 ratios must equal the independent
    rigid-rotor re-derivation (tools/derive_radio_lines.py): asymmetric-
    rotor b-type dipole matrix elements for H2O/H2S (dipole sum rule
    validated to machine precision), K-summed Hoenl-London R-branch for
    PH3.  Replaces the r4 'representative' stand-ins (VERDICT r4 item 5)."""
    import os
    import sys

    from pyharp_tpu.opacity.radio import load_vvw_lines

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from derive_radio_lines import (check_sum_rule, h2o_weight, ph3_lines,
                                    water_like_lines, _intensity_at_measured)

    # conventions are validated by the exact dipole sum rule
    assert check_sum_rule(27.8806, 14.5216, 9.2778) < 1e-10
    assert check_sum_rule(10.3735, 9.0161, 4.7313) < 1e-10

    for path, A, B, C, labels in [
        ("radio_h2o_lines.txt", 27.8806, 14.5216, 9.2778,
         [(6, (1, 6), 5, (2, 3)), (2, (2, 0), 3, (1, 3)),
          (4, (2, 2), 5, (1, 5)), (3, (2, 1), 4, (1, 4)),
          (1, (0, 1), 1, (1, 0))]),
        ("radio_h2s_lines.txt", 10.3735, 9.0161, 4.7313,
         [(1, (0, 1), 1, (1, 0)), (2, (1, 1), 2, (2, 0)),
          (3, (1, 2), 3, (2, 1)), (2, (0, 2), 2, (1, 1)),
          (0, (0, 0), 1, (1, 1))]),
    ]:
        shipped = load_vvw_lines(path)
        table = {ln["label"]: ln for ln in water_like_lines(
            A, B, C, h2o_weight, Jmax=8)}
        rel_want = [
            _intensity_at_measured(table[lab], ln.nu0, ln.elow)
            for lab, ln in zip(labels, shipped)]
        # compare RATIOS (the table is anchored to the r4 absolute scale)
        want = np.asarray(rel_want) / rel_want[0]
        got = np.asarray([ln.s300 for ln in shipped]) / shipped[0].s300
        np.testing.assert_allclose(got, want, rtol=2e-3)

    shipped = load_vvw_lines("radio_ph3_lines.txt")
    derived = {ln["label"][0]: ln for ln in ph3_lines(Jmax=3)}
    kg = 1.438777 / 29.9792458
    rel = []
    for J, ln in zip((0, 1, 2), shipped):
        d = derived[J]
        rel.append(d["inten"] / (d["nu"] * (1 - np.exp(-d["nu"] * kg / 300)))
                   * ln.nu0 * (1 - np.exp(-ln.nu0 * kg / 300)))
    want = np.asarray(rel) / rel[1]
    got = np.asarray([ln.s300 for ln in shipped]) / shipped[1].s300
    np.testing.assert_allclose(got, want, rtol=2e-3)
