"""RadiationBand / Radiation / YAML factory tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyharp_tpu.opacity.base import AttenuatorOptions
from pyharp_tpu.radiation.band import RadiationBand, RadiationBandOptions
from pyharp_tpu.radiation.radiation import Radiation, RadiationOptions
from pyharp_tpu.radiation.factory import create_radiation_options
from pyharp_tpu.radiation.shared import shared
from pyharp_tpu.rt.disort.disort import DisortOptions
from pyharp_tpu import write_rfm_table


def aerosol_band_options(nwave=4, ncol=1, nlyr=5):
    op = AttenuatorOptions(
        species_names=("S8", "H2SO4"),
        species_weights=(256.0e-3, 98.0e-3),
    )
    return RadiationBandOptions(
        name="sw",
        nlyr=nlyr, ncol=ncol,
        wave_lower=(2000.0,) * nwave,
        wave_upper=(50000.0,) * nwave,
        attenuators=(
            ("s8", op.replace(species_ids=(0,), type="s8_fuller",
                              opacity_files=("s8_k_fuller.txt",))),
            # exercise the deliberately-accepted reference typo
            ("h2so4", op.replace(species_ids=(1,), type="h2sO4_simple",
                                 opacity_files=("h2so4.txt",))),
        ),
        disort=DisortOptions(flags="lamber,quiet,onlyfl", nstr=8, nmom=8),
    )


def test_band_optics_accumulation_matches_manual():
    """Band accumulation must equal the reference recipe
    (radiation_band.cpp:86-116) computed by hand."""
    bop = aerosol_band_options()
    band = RadiationBand(bop, dtype=jnp.float64)
    ncol, nlyr = 1, 5
    conc = jnp.full((ncol, nlyr, 2), 2.0, jnp.float64)
    wave = jnp.linspace(2000.0, 50000.0, 4, dtype=jnp.float64)
    dz = jnp.linspace(100.0, 500.0, nlyr, dtype=jnp.float64)

    prop = band.compute_optics(conc, dz, wavenumber=wave)
    assert prop.shape == (4, 1, 5, 2)

    s8 = band.attenuators["s8"]
    h2 = band.attenuators["h2so4"]
    k1 = s8.forward(conc, wavenumber=wave)
    k2 = h2.forward(conc, wavenumber=wave)
    ext = k1[..., 0] + k2[..., 0]
    ssa_w = k1[..., 1] + k2[..., 1]
    want_tau = ext * np.asarray(dz)[None, None, :]
    want_ssa = ssa_w / (ext + 1e-10)
    np.testing.assert_allclose(prop[..., 0], want_tau, rtol=1e-12)
    np.testing.assert_allclose(prop[..., 1], want_ssa, rtol=1e-12)


def test_band_forward_and_shared_export():
    bop = aerosol_band_options()
    band = RadiationBand(bop, dtype=jnp.float64)
    conc = jnp.full((1, 5, 2), 1.0, jnp.float64)
    wave = jnp.linspace(2000.0, 50000.0, 4, dtype=jnp.float64)
    dz = jnp.full((5,), 200.0, jnp.float64)
    bc = dict(fbeam=jnp.full((4, 1), np.pi), umu0=jnp.ones((4, 1)),
              albedo=jnp.zeros((4, 1)))
    flux = band.forward(conc, dz, bc, dict(wavenumber=wave))
    assert flux.shape == (4, 1, 6, 2)
    assert np.all(np.isfinite(np.asarray(flux)))
    assert "radiation/sw/optics" in shared


def test_band_forward_is_jittable():
    bop = aerosol_band_options()
    band = RadiationBand(bop, dtype=jnp.float64)

    @jax.jit
    def run(conc, dz, wave, fbeam, umu0, albedo):
        return band.forward(conc, dz,
                            dict(fbeam=fbeam, umu0=umu0, albedo=albedo),
                            dict(wavenumber=wave))

    conc = jnp.ones((1, 5, 2), jnp.float64)
    wave = jnp.linspace(2000.0, 50000.0, 4, dtype=jnp.float64)
    dz = jnp.full((5,), 200.0, jnp.float64)
    f = run(conc, dz, wave, jnp.full((4, 1), np.pi), jnp.ones((4, 1)),
            jnp.zeros((4, 1)))
    assert f.shape == (4, 1, 6, 2)


def test_unknown_attenuator_type_raises():
    bop = aerosol_band_options()
    bad = bop.replace(attenuators=(
        ("x", AttenuatorOptions(type="nope", species_ids=(0,),
                                species_names=("S8",),
                                species_weights=(0.256,),
                                opacity_files=("s8_k_fuller.txt",))),))
    with pytest.raises(ValueError, match="Unknown attenuator"):
        RadiationBand(bad)


def test_radiation_flags_parity():
    ro = RadiationOptions().set_flags("broad_band, stellar_beam")
    assert ro.broad_band and ro.stellar_beam and not ro.time_dependent
    with pytest.raises(ValueError, match="unrecognized"):
        RadiationOptions().set_flags("bogus_flag")


def test_yaml_factory_amarsw_schema(tmp_path):
    """Parse the reference's amarsw-ck.yaml schema with synthetic tables."""
    ng = 4
    tables = {}
    rng = np.random.default_rng(0)
    for b in ("b1", "b2"):
        path = str(tmp_path / f"amarsw-ck-{b.upper()}.nc")
        x, w = np.polynomial.legendre.leggauss(ng)
        write_rfm_table(
            path,
            np.linspace(1, 150, ng), np.logspace(5, 2, 6),
            np.linspace(-50, 50, 5), np.linspace(300, 150, 6),
            {"CO2": rng.uniform(-3, 0, (ng, 6, 5)),
             "H2O": rng.uniform(-4, -1, (ng, 6, 5))},
            weights=w / w.sum())
        tables[b] = path

    config = {
        "opacity-sources": [
            {"name": "CO2", "class": "HitranCK", "data": tables["b1"],
             "dependent-species": ["vapor.dry"]},
            {"name": "H2O", "class": "HitranCK", "data": tables["b2"],
             "dependent-species": ["vapor.H2O"]},
        ],
        "bands": ["B1", "B2"],
        "B1": {"units": "cm-1", "grid-type": "cktable",
               "wavenumber-range": [1.0, 150.0], "opacity": ["CO2"],
               "rt-solver": "Disort", "flags": ["thermal_emission"]},
        "B2": {"units": "cm-1", "grid-type": "cktable",
               "wavenumber-range": [150.0, 500.0], "opacity": ["H2O"],
               "rt-solver": "Disort", "flags": ["thermal_emission"]},
        "Disort-flags": {"lamber": True, "onlyfl": True, "quiet": True,
                         "intensity_correction": True, "ibcnd": False},
    }
    species = {"CO2": (0, 44.0e-3), "H2O": (1, 18.0e-3)}
    ro = create_radiation_options(config, species, nlyr=6, ncol=1)
    assert ro.bands == ("B1", "B2")
    b1 = ro.band_options[0]
    assert b1.solver_name == "disort"
    assert len(b1.ck_weights) == ng
    assert "planck" in b1.disort.flags

    rad = Radiation(ro, dtype=jnp.float64)
    conc = jnp.ones((1, 6, 2), jnp.float64)
    dz = jnp.full((6,), 1000.0, jnp.float64)
    atm = dict(pres=jnp.full((1, 6), 1.0e5, jnp.float64),
               temp=jnp.full((1, 6), 260.0, jnp.float64))
    bc = dict(albedo=jnp.zeros((ng, 1)), btemp=jnp.full((ng, 1), 280.0))
    total = rad.forward(conc, dz, bc, atm)
    assert total.shape == (1, 7, 2)
    assert np.all(np.isfinite(np.asarray(total)))
    # two thermal bands with emitting surface: upward flux at TOA positive
    assert float(total[0, -1, 0]) > 0


def _regular_sw_config(res):
    """amarsw-lbl.yaml-style regular-grid SW aerosol band config."""
    return {
        "opacity-sources": [
            {"name": "S8", "class": "S8Fuller", "data": "s8_k_fuller.txt"},
            {"name": "H2SO4", "class": "H2SO4Simple", "data": "h2so4.txt"},
        ],
        "bands": ["SW"],
        "SW": {"units": "cm-1", "grid-type": "regular",
               "wavenumber-range": [2000.0, 50000.0], "resolution": res,
               "opacity": ["S8", "H2SO4"], "rt-solver": "Disort"},
        "Disort-flags": {"lamber": True, "onlyfl": True, "quiet": True},
    }


def test_yaml_regular_grid_matches_hand_integration():
    """A regular-grid YAML band must reproduce the hand-integrated
    examples/amars_sw.py flux (VERDICT r3 item 1: the per-bin edges must
    subdivide [wmin, wmax]; width weighting must not overcount)."""
    nwave, ncol, nlyr = 40, 1, 8
    wmin, wmax = 2000.0, 50000.0
    res = (wmax - wmin) / (nwave - 1)
    species = {"S8": (0, 256.0e-3), "H2SO4": (1, 98.0e-3)}
    ro = create_radiation_options(_regular_sw_config(res), species,
                                  nlyr=nlyr, ncol=ncol, nstr=8)
    bop = ro.band_options[0]
    assert len(bop.wave_lower) == nwave
    # per-bin edges TILE [wmin, wmax]: interior bins res wide, the clipped
    # end bins res/2 (trapezoid weights), contiguous with no overlap
    widths = np.asarray(bop.wave_upper) - np.asarray(bop.wave_lower)
    np.testing.assert_allclose(widths[1:-1], res, rtol=1e-12)
    np.testing.assert_allclose(widths[[0, -1]], res / 2, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(bop.wave_lower)[1:],
                               np.asarray(bop.wave_upper)[:-1], rtol=1e-12)
    assert bop.wave_lower[0] == wmin and bop.wave_upper[-1] == wmax
    np.testing.assert_allclose(np.asarray(bop.wavenumber),
                               np.linspace(wmin, wmax, nwave), rtol=1e-12)

    rad = Radiation(ro, dtype=jnp.float64)
    conc = jnp.full((ncol, nlyr, 2), 1e-5, jnp.float64)
    dz = jnp.full((nlyr,), 2000.0, jnp.float64)
    wave = jnp.linspace(wmin, wmax, nwave, dtype=jnp.float64)
    fbeam = jnp.broadcast_to(
        (1e-9 * wave**3 / (jnp.exp(1.4388 * wave / 5772.0) - 1.0))[:, None],
        (nwave, ncol))
    bc = dict(fbeam=fbeam, umu0=jnp.ones((nwave, ncol)),
              albedo=jnp.ones((nwave, ncol)))
    total = rad.forward(conc, dz, bc)   # (ncol, nlvl, 2)

    # hand path (examples/amars_sw.py style): attenuators wired directly
    # to Disort; the YAML band's clipped end bins make its quadrature the
    # trapezoid rule, which differs from the example's rectangle rule by
    # exactly half the two end samples
    band = rad.bands["SW"]
    prop = band.compute_optics(conc, dz, wavenumber=wave)
    flux = np.asarray(band.rtsolver.forward(prop, bc))
    w = np.full(nwave, res)
    w[[0, -1]] = res / 2
    want = np.einsum("g,g...->...", w, flux)
    np.testing.assert_allclose(np.asarray(total), want, rtol=1e-6)
    # ... and stays within sampling error of the rectangle-rule integral
    np.testing.assert_allclose(np.asarray(total), flux.sum(axis=0) * res,
                               rtol=2e-2)
    # regression: the r3 bug overcounted by ~nwave
    assert np.all(np.asarray(total)[..., 1] < want[..., 1] * 1.5)


def test_yaml_regular_grid_thermal_planck_subbins():
    """A regular-grid thermal band must emit each bin's sub-bin Planck
    share: TOA upward flux over a transparent atmosphere equals
    pi * B(btemp) integrated over the band (NOT nwave times it)."""
    from pyharp_tpu.rt.disort.planck import planck_band

    nwave, ncol, nlyr = 16, 1, 4
    wmin, wmax, btemp = 1.0, 1500.0, 260.0
    res = (wmax - wmin) / (nwave - 1)
    config = {
        "opacity-sources": [
            {"name": "S8", "class": "S8Fuller", "data": "s8_k_fuller.txt"},
        ],
        "bands": ["LW"],
        "LW": {"units": "cm-1", "grid-type": "regular",
               "wavenumber-range": [wmin, wmax], "resolution": res,
               "opacity": ["S8"], "rt-solver": "Disort",
               "flags": ["thermal_emission"]},
        "Disort-flags": {"lamber": True, "onlyfl": True, "quiet": True},
    }
    species = {"S8": (0, 256.0e-3)}
    ro = create_radiation_options(config, species, nlyr=nlyr, ncol=ncol)
    rad = Radiation(ro, dtype=jnp.float64)
    assert rad.bands["LW"].bins_are_integrated

    conc = jnp.full((ncol, nlyr, 2), 1e-30, jnp.float64)  # ~transparent
    dz = jnp.full((nlyr,), 100.0, jnp.float64)
    atm = dict(temp=jnp.full((ncol, nlyr), 200.0, jnp.float64))
    bc = dict(albedo=jnp.zeros((nwave, ncol)),
              btemp=jnp.full((nwave, ncol), btemp, jnp.float64))
    total = rad.forward(conc, dz, bc, atm)

    # clipped end bins tile [wmin, wmax] EXACTLY, so the sub-bin Planck
    # integrals sum to the full band integral
    want = np.pi * float(planck_band(
        jnp.asarray(btemp, jnp.float64),
        jnp.asarray(wmin, jnp.float64),
        jnp.asarray(wmax, jnp.float64)))
    got = float(total[0, -1, 0])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_adjacent_thermal_bands_tile_without_seam_overlap():
    """Two adjacent regular thermal bands must sum to the single band
    covering their union over a transparent atmosphere: the shared
    boundary interval is counted exactly once (r4 review finding)."""
    from pyharp_tpu.rt.disort.planck import planck_band

    btemp, nlyr, ncol = 260.0, 3, 1
    species = {"S8": (0, 256.0e-3)}

    def thermal_cfg(bands):
        cfg = {
            "opacity-sources": [
                {"name": "S8", "class": "S8Fuller",
                 "data": "s8_k_fuller.txt"}],
            "bands": [b[0] for b in bands],
            "Disort-flags": {"lamber": True, "onlyfl": True, "quiet": True},
        }
        for name, lo, hi in bands:
            cfg[name] = {"grid-type": "regular", "wavenumber-range": [lo, hi],
                         "resolution": 50.0, "opacity": ["S8"],
                         "rt-solver": "Disort",
                         "flags": ["thermal_emission"]}
        return cfg

    def toa_up(bands):
        ro = create_radiation_options(thermal_cfg(bands), species,
                                      nlyr=nlyr, ncol=ncol)
        rad = Radiation(ro, dtype=jnp.float64)
        conc = jnp.full((ncol, nlyr, 2), 1e-30, jnp.float64)
        dz = jnp.full((nlyr,), 100.0, jnp.float64)
        atm = dict(temp=jnp.full((ncol, nlyr), 200.0, jnp.float64))
        bc = dict(albedo=0.0, btemp=btemp)
        return float(rad.forward(conc, dz, bc, atm)[0, -1, 0])

    split = toa_up([("A", 100.0, 600.0), ("B", 600.0, 1100.0)])
    joint = toa_up([("AB", 100.0, 1100.0)])
    np.testing.assert_allclose(split, joint, rtol=1e-6)
    want = np.pi * float(planck_band(jnp.asarray(btemp, jnp.float64),
                                     jnp.asarray(100.0, jnp.float64),
                                     jnp.asarray(1100.0, jnp.float64)))
    np.testing.assert_allclose(split, want, rtol=1e-5)


def test_spherical_flux_correction_matches_reference_loop():
    from pyharp_tpu.utils.spherical import spherical_flux_correction

    rng = np.random.default_rng(1)
    nx1 = 7
    flx = rng.uniform(1, 2, (3, nx1))
    x1f = np.sort(rng.uniform(0, 10, nx1))
    area = rng.uniform(1, 2, (3, nx1))
    vol = rng.uniform(0.1, 1, (3, nx1))

    # reference in-place loop (spherical_flux_correction.cpp:3-18)
    want = flx.copy()
    flx_iu = want[:, nx1 - 1].copy()
    for i in range(nx1 - 2, -1, -1):
        dx1f = x1f[i + 1] - x1f[i]
        volh = (flx_iu - want[:, i]) / dx1f * vol[:, i]
        flx_iu = want[:, i].copy()
        want[:, i] = (want[:, i + 1] * area[:, i + 1] - volh) / area[:, i]

    got = spherical_flux_correction(jnp.asarray(flx), jnp.asarray(x1f),
                                    jnp.asarray(area), jnp.asarray(vol))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12)


def test_direction_parsing():
    from pyharp_tpu.utils.directions import (
        parse_radiation_direction, parse_radiation_directions,
        get_direction_grids)

    d = parse_radiation_direction("(60., 30.)")
    np.testing.assert_allclose(d, [0.5, np.pi / 6], atol=1e-12)
    ds = parse_radiation_directions("(0., 0.) (60., 30.) (60., 30.0001)")
    assert ds.shape == (3, 2)
    uphi, umu = get_direction_grids(ds)
    assert len(umu) == 2   # cos(0)=1 and cos(60)=0.5
    assert len(uphi) == 2  # 0 and pi/6 (dup within 1e-3 dropped)


def test_band_radiance_and_writers(tmp_path):
    """Legacy CalBandRadiance / write_bin_radiance path: TOA radiances at
    configured outdirs, written as ascii or binary tables."""
    from pyharp_tpu.utils.output import read_radiance_bin

    nwave, ncol, nlyr = 4, 1, 5
    config_opts = aerosol_band_options(nwave=nwave, ncol=ncol, nlyr=nlyr)
    bop = config_opts.replace(
        outdirs="(0., 0.) (60., 30.)",
        wavenumber=tuple(np.linspace(2000.0, 50000.0, nwave)),
        # nstr=4 keeps the per-mode radiance graphs small — this test pins
        # the ray-gather/writer plumbing, not solver accuracy
        disort=config_opts.disort.replace(
            flags="lamber,quiet,usrang,intensity_correction",
            nstr=4, nmom=4),
    )
    ro = RadiationOptions(bands=("sw",), band_options=(bop,))
    rad = Radiation(ro, dtype=jnp.float64)

    conc = jnp.full((ncol, nlyr, 2), 1e-4, jnp.float64)
    dz = jnp.full((nlyr,), 2000.0, jnp.float64)
    bc = dict(fbeam=jnp.full((nwave, ncol), np.pi),
              umu0=jnp.full((nwave, ncol), 0.8),
              albedo=jnp.full((nwave, ncol), 0.3))

    rads = rad.band_radiances(conc, dz, bc)
    assert set(rads) == {"sw"}
    r = np.asarray(rads["sw"])
    assert r.shape == (nwave, ncol, 2)
    assert np.all(np.isfinite(r)) and np.all(r > 0)  # scattered beam light

    # ascii writer (flag off)
    paths = rad.write_radiances(str(tmp_path / "rad_"), conc, dz, bc)
    assert paths == [str(tmp_path / "rad_sw.txt")]
    txt = open(paths[0]).read()
    assert "rays (mu, phi)" in txt and len(txt.splitlines()) == 2 + nwave

    # binary writer (flag on) round-trips
    rad_bin = Radiation(
        RadiationOptions(bands=("sw",), band_options=(bop,),
                         write_bin_radiance=True), dtype=jnp.float64)
    paths = rad_bin.write_radiances(str(tmp_path / "radb_"), conc, dz, bc)
    data, rays = read_radiance_bin(paths[0])
    np.testing.assert_allclose(data, r[:, 0, :], rtol=1e-6)
    assert rays.shape == (2, 2)


def test_stellar_beam_bc(tmp_path):
    """stellar_beam flag: fbeam from a spectrum file or a blackbody,
    inverse-square scaled (legacy Prepare, rt_solver_disort.cpp_:37-105)."""
    nwave = 8
    wmin, wmax = 2000.0, 50000.0
    res = (wmax - wmin) / (nwave - 1)
    species = {"S8": (0, 256.0e-3), "H2SO4": (1, 98.0e-3)}
    ro = create_radiation_options(_regular_sw_config(res), species,
                                  nlyr=4, ncol=1).set_flags("stellar_beam")
    rad = Radiation(ro, dtype=jnp.float64)

    # blackbody: scales inverse-square with distance
    bc1 = rad.stellar_beam_bc("SW", mu0=0.8, distance_au=1.0)
    bc2 = rad.stellar_beam_bc("SW", mu0=0.8, distance_au=2.0)
    assert bc1["fbeam"].shape == (nwave, 1)
    np.testing.assert_allclose(np.asarray(bc1["fbeam"]),
                               4.0 * np.asarray(bc2["fbeam"]), rtol=1e-6)
    # sanity: integrated solar flux at 1 AU within 20% of 1361 W/m^2
    # (rectangle rule on this coarse grid)
    total = float(np.sum(np.asarray(bc1["fbeam"])[:, 0]) * res)
    assert 1000.0 < total < 1700.0, total

    # spectrum file: interpolated onto the band grid
    grid = np.linspace(wmin, wmax, nwave)
    wavef = tmp_path / "wave.txt"
    fluxf = tmp_path / "flux.txt"
    np.savetxt(wavef, np.linspace(wmin - 100, wmax + 100, 50))
    np.savetxt(fluxf, np.linspace(1.0, 2.0, 50))
    bc3 = rad.stellar_beam_bc("SW", mu0=0.5, flux_file=str(fluxf),
                              wave_file=str(wavef), distance_au=1.0)
    fb = np.asarray(bc3["fbeam"])[:, 0]
    assert fb[0] < fb[-1] and np.all((0.9 < fb) & (fb < 2.1))

    # flag not set -> clear error
    ro_off = create_radiation_options(_regular_sw_config(res), species,
                                      nlyr=4, ncol=1)
    with pytest.raises(ValueError, match="stellar_beam"):
        Radiation(ro_off).stellar_beam_bc("SW", mu0=0.5)


def test_fused_bands_match_sequential(tmp_path):
    """fuse_bands=True (one batched solve over the concatenated wave axis)
    must reproduce the sequential per-band path exactly."""
    ng = 4
    rng = np.random.default_rng(3)
    tables = {}
    for b in ("b1", "b2", "b3"):
        path = str(tmp_path / f"fuse-ck-{b.upper()}.nc")
        x, w = np.polynomial.legendre.leggauss(ng)
        write_rfm_table(
            path, np.linspace(1, 150, ng), np.logspace(5, 2, 6),
            np.linspace(-50, 50, 5), np.linspace(300, 150, 6),
            {"CO2": rng.uniform(-3, 0, (ng, 6, 5))}, weights=w / w.sum())
        tables[b] = path
    config = {
        "opacity-sources": [
            {"name": "CO2", "class": "HitranCK", "data": tables[b]}
            for b in ("b1", "b2", "b3")],
        "bands": ["B1", "B2", "B3"],
        "B1": {"grid-type": "cktable", "wavenumber-range": [1.0, 150.0],
               "opacity": ["CO2"], "rt-solver": "Disort",
               "flags": ["thermal_emission"]},
        "B2": {"grid-type": "cktable", "wavenumber-range": [150.0, 500.0],
               "opacity": ["CO2"], "rt-solver": "Disort",
               "flags": ["thermal_emission"]},
        "B3": {"grid-type": "cktable", "wavenumber-range": [500.0, 1450.0],
               "opacity": ["CO2"], "rt-solver": "Disort",
               "flags": ["thermal_emission"]},
        "Disort-flags": {"lamber": True, "onlyfl": True, "quiet": True},
    }
    species = {"CO2": (0, 44.0e-3)}
    ro = create_radiation_options(config, species, nlyr=5, ncol=2)
    rad = Radiation(ro, dtype=jnp.float64)

    conc = jnp.ones((2, 5, 1), jnp.float64)
    dz = jnp.full((5,), 800.0, jnp.float64)
    atm = dict(pres=jnp.full((2, 5), 1.0e5, jnp.float64),
               temp=jnp.full((2, 5), 255.0, jnp.float64))
    bc = dict(albedo=0.1, btemp=280.0)

    seq, aux_s = rad.forward(conc, dz, bc, atm, return_aux=True)
    fus, aux_f = rad.forward(conc, dz, bc, atm, return_aux=True,
                             fuse_bands=True)
    np.testing.assert_allclose(np.asarray(fus), np.asarray(seq), rtol=1e-12)
    for name in ro.bands:
        np.testing.assert_allclose(
            np.asarray(aux_f[f"radiation/{name}/flux"]),
            np.asarray(aux_s[f"radiation/{name}/flux"]), rtol=1e-12)
    # the fused path really did group: one solver for the 3 bands
    assert len(rad._fused_solvers) == 1

    # jittable end to end
    fused_jit = jax.jit(lambda c, d: rad.forward(
        c, d, bc, atm, fuse_bands=True))(conc, dz)
    np.testing.assert_allclose(np.asarray(fused_jit), np.asarray(seq),
                               rtol=1e-12)


def test_fused_bands_heterogeneous_nwave_beam():
    """Fusion across regular-grid beam bands with DIFFERENT per-band nwave
    (concat + per-band bc broadcasting) matches the sequential path."""
    species = {"S8": (0, 256.0e-3), "H2SO4": (1, 98.0e-3)}
    config = {
        "opacity-sources": [
            {"name": "S8", "class": "S8Fuller", "data": "s8_k_fuller.txt"},
            {"name": "H2SO4", "class": "H2SO4Simple", "data": "h2so4.txt"},
        ],
        "bands": ["SWA", "SWB"],
        "SWA": {"grid-type": "regular", "wavenumber-range": [2000.0, 20000.0],
                "resolution": 2000.0, "opacity": ["S8", "H2SO4"],
                "rt-solver": "Disort"},
        "SWB": {"grid-type": "regular", "wavenumber-range": [20000.0, 50000.0],
                "resolution": 5000.0, "opacity": ["S8"],
                "rt-solver": "Disort"},
        "Disort-flags": {"lamber": True, "onlyfl": True, "quiet": True},
    }
    ro = create_radiation_options(config, species, nlyr=6, ncol=2, nstr=4)
    rad = Radiation(ro, dtype=jnp.float64)
    nwA = len(ro.band_options[0].wave_lower)
    nwB = len(ro.band_options[1].wave_lower)
    assert nwA != nwB

    conc = jnp.full((2, 6, 2), 1e-4, jnp.float64)
    dz = jnp.full((6,), 1500.0, jnp.float64)
    bc = dict(fbeam=2.0, umu0=0.7, albedo=0.2)   # scalars broadcast per band

    seq = rad.forward(conc, dz, bc)
    fus = rad.forward(conc, dz, bc, fuse_bands=True)
    np.testing.assert_allclose(np.asarray(fus), np.asarray(seq), rtol=1e-12)
    assert len(rad._fused_solvers) == 1
    # the fused solver really spans both bands' bins
    (key, ds), = rad._fused_solvers.items()
    assert ds.options.nwave == nwA + nwB


def test_fused_bands_grouping_and_fallbacks(tmp_path):
    """Incompatible bands (planck vs beam flags; BeerLambert) must not fuse
    with each other, and mixed nprop within a group pads correctly."""
    nw = 3   # LBL-style table: wave axis == the bands' 3-point grid
    path = str(tmp_path / "grp-lbl-B1.nc")
    write_rfm_table(path, np.array([2500.0, 3500.0, 4500.0]),
                    np.logspace(5, 2, 6), np.linspace(-50, 50, 5),
                    np.linspace(300, 150, 6),
                    {"CO2": np.full((nw, 6, 5), -2.0)})

    op_aer = AttenuatorOptions(
        species_names=("CO2", "S8"), species_weights=(44.0e-3, 256.0e-3),
        species_ids=(1,), type="s8_fuller",
        opacity_files=("s8_k_fuller.txt",))
    op_gas = AttenuatorOptions(
        species_names=("CO2", "S8"), species_weights=(44.0e-3, 256.0e-3),
        species_ids=(0,), type="rfm", opacity_files=(path,))
    mk = lambda name, **kw: RadiationBandOptions(
        name=name, nlyr=4, ncol=1,
        wave_lower=tuple(2000.0 + 1000.0 * i for i in range(nw)),
        wave_upper=tuple(3000.0 + 1000.0 * i for i in range(nw)),
        wavenumber=tuple(2500.0 + 1000.0 * i for i in range(nw)), **kw)
    # two fusable beam bands with DIFFERENT nprop (gas-only vs gas+aerosol)
    b1 = mk("b1", attenuators=(("gas", op_gas),),
            disort=DisortOptions(flags="lamber,quiet,onlyfl", nstr=4,
                                 nmom=4))
    b2 = mk("b2", attenuators=(("gas", op_gas), ("aer", op_aer)),
            disort=DisortOptions(flags="lamber,quiet,onlyfl", nstr=4,
                                 nmom=4))
    # a planck band (different flags -> different group)
    b3 = mk("b3", attenuators=(("gas", op_gas),),
            disort=DisortOptions(flags="lamber,quiet,onlyfl,planck", nstr=4,
                                 nmom=4))
    # a BeerLambert band (never fused)
    b4 = mk("b4", attenuators=(("gas", op_gas),), solver_name="beer_lambert")
    ro = RadiationOptions(bands=("b1", "b2", "b3", "b4"),
                          band_options=(b1, b2, b3, b4))
    rad = Radiation(ro, dtype=jnp.float64)

    conc = jnp.full((1, 4, 2), 1e-3, jnp.float64)
    dz = jnp.full((4,), 500.0, jnp.float64)
    atm = dict(pres=jnp.full((1, 4), 1e5, jnp.float64),
               temp=jnp.full((1, 4), 260.0, jnp.float64))
    bc = dict(fbeam=2.0, umu0=0.7, albedo=0.2, btemp=270.0)

    seq = rad.forward(conc, dz, bc, atm)
    fus = rad.forward(conc, dz, bc, atm, fuse_bands=True)
    np.testing.assert_allclose(np.asarray(fus), np.asarray(seq), rtol=1e-12)
    # only b1+b2 fused; b3 (planck) and b4 (BeerLambert) solved solo
    assert len(rad._fused_solvers) == 1
    (key, ds), = rad._fused_solvers.items()
    assert ds.options.nwave == 2 * nw
