"""Round-5 behavior pins: tracer-safe blackboard, time_dependent cache,
broad_band refusal, print-* diagnostics, explicit opacity-source matching,
degenerate regular-grid resolution.

Targets VERDICT r4 items 3 (blackboard tracer leak at the RadiationBand
call site), 8 (silent `_pick_source` wrong-choice risk), 9 (declared-but-
inert flags), and the ADVICE r4 degenerate-resolution finding.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyharp_tpu.opacity.base import AttenuatorOptions
from pyharp_tpu.radiation.band import RadiationBand, RadiationBandOptions
from pyharp_tpu.radiation.radiation import Radiation, RadiationOptions
from pyharp_tpu.radiation.factory import create_radiation_options, \
    _pick_source
from pyharp_tpu.radiation.shared import shared
from pyharp_tpu.rt.disort.disort import Disort, DisortOptions


def _band_options(nwave=4, ncol=1, nlyr=5, name="sw"):
    op = AttenuatorOptions(
        species_names=("S8",), species_weights=(256.0e-3,))
    return RadiationBandOptions(
        name=name, nlyr=nlyr, ncol=ncol,
        wave_lower=(2000.0,) * nwave,
        wave_upper=(50000.0,) * nwave,
        attenuators=(
            ("s8", op.replace(species_ids=(0,), type="s8_fuller",
                              opacity_files=("s8_k_fuller.txt",))),),
        disort=DisortOptions(flags="lamber,quiet,onlyfl", nstr=4, nmom=4),
    )


def _inputs(nwave=4, ncol=1, nlyr=5):
    conc = jnp.ones((ncol, nlyr, 1), jnp.float64)
    wave = jnp.linspace(2000.0, 50000.0, nwave, dtype=jnp.float64)
    dz = jnp.full((nlyr,), 200.0, jnp.float64)
    bc = dict(fbeam=jnp.full((nwave, ncol), np.pi),
              umu0=jnp.ones((nwave, ncol)),
              albedo=jnp.zeros((nwave, ncol)))
    return conc, wave, dz, bc


# ---------------------------------------------------------------------------
# shared blackboard: never retains tracers (radiation_band.cpp:118-120
# semantics, with the Disort._stash policy applied at the dict itself)
# ---------------------------------------------------------------------------

def test_shared_blackboard_rejects_tracers_cleanly():
    band = RadiationBand(_band_options(), dtype=jnp.float64)
    conc, wave, dz, bc = _inputs()

    @jax.jit
    def run(conc, dz, wave, fbeam, umu0, albedo):
        return band.forward(conc, dz,
                            dict(fbeam=fbeam, umu0=umu0, albedo=albedo),
                            dict(wavenumber=wave))

    run(conc, dz, wave, bc["fbeam"], bc["umu0"], bc["albedo"])
    # the traced forward stored a sentinel, not a leaked tracer
    with pytest.raises(RuntimeError, match="traced"):
        shared["radiation/sw/optics"]
    assert shared.get("radiation/sw/optics") is None

    # a subsequent EAGER forward repopulates it with concrete values
    band.forward(conc, dz, bc, dict(wavenumber=wave))
    assert np.all(np.isfinite(
        np.asarray(shared["radiation/sw/optics"])))


# ---------------------------------------------------------------------------
# time_dependent / broad_band flags (radiation.cpp:18-36)
# ---------------------------------------------------------------------------

def _radiation(flags=""):
    bop = _band_options()
    ro = RadiationOptions(bands=("sw",), band_options=(bop,))
    if flags:
        ro = ro.set_flags(flags)
    return Radiation(ro, dtype=jnp.float64)


def test_time_dependent_cache_roundtrip():
    rad = _radiation("time_dependent")
    conc, wave, dz, bc = _inputs()
    atm = dict(wavenumber=wave)
    total = rad.forward(conc, dz, bc, atm)
    cached = rad.forward(conc, dz, bc, atm, use_cache=True)
    np.testing.assert_array_equal(np.asarray(total), np.asarray(cached))


def test_time_dependent_cache_requires_flag_and_prior_call():
    rad = _radiation()
    conc, wave, dz, bc = _inputs()
    with pytest.raises(ValueError, match="time_dependent"):
        rad.forward(conc, dz, bc, dict(wavenumber=wave), use_cache=True)
    rad2 = _radiation("time_dependent")
    with pytest.raises(RuntimeError, match="cache is empty"):
        rad2.forward(conc, dz, bc, dict(wavenumber=wave), use_cache=True)


def test_broad_band_refuses_loudly():
    rad = _radiation("broad_band")
    conc, wave, dz, bc = _inputs()
    with pytest.raises(NotImplementedError, match="broad_band"):
        rad.forward(conc, dz, bc, dict(wavenumber=wave))


# ---------------------------------------------------------------------------
# print-* flags produce cdisort-style diagnostics in eager mode
# (flag list: /root/reference/examples/amarsw-ck.yaml:96-103)
# ---------------------------------------------------------------------------

def test_print_flags_emit_diagnostics(capsys):
    nwave, ncol, nlyr = 2, 1, 3
    ds = Disort(DisortOptions(
        header="print test",
        flags="lamber,quiet,onlyfl,print-input,print-fluxes,"
              "print-phase-function",
        nwave=nwave, ncol=ncol, nlyr=nlyr, nstr=4, nmom=4))
    prop = np.zeros((nwave, ncol, nlyr, 3))
    prop[..., 0] = 0.3
    prop[..., 1] = 0.5
    prop[..., 2] = 0.2
    bc = dict(fbeam=jnp.full((nwave, ncol), np.pi),
              umu0=jnp.ones((nwave, ncol)),
              albedo=jnp.zeros((nwave, ncol)))
    ds.forward(jnp.asarray(prop), bc)
    out = capsys.readouterr().out
    assert "print test: input" in out
    assert "dtauc" in out
    assert "print test: fluxes" in out
    assert "phase moments" in out

    # under jit the same flags are silent (host prints cannot trace)
    jax.jit(lambda p: ds.forward(p, bc))(jnp.asarray(prop))
    assert "input" not in capsys.readouterr().out


# ---------------------------------------------------------------------------
# explicit opacity-source matching (radiation_bands_factory.cpp_:16-51)
# ---------------------------------------------------------------------------

def test_pick_source_explicit_band_key_wins():
    cands = [{"name": "co2", "data": "tab_a.nc", "band": "B1"},
             {"name": "co2", "data": "tab_b.nc", "band": "B2"}]
    assert _pick_source(cands, "B2")["data"] == "tab_b.nc"
    with pytest.raises(ValueError, match="declare"):
        _pick_source(cands, "B3")


def test_pick_source_ambiguous_filenames_raise():
    # two sources share the name; NEITHER filename contains the band name:
    # the old code silently picked the first — now it must raise
    cands = [{"name": "co2", "data": "table_one.nc"},
             {"name": "co2", "data": "table_two.nc"}]
    with pytest.raises(ValueError, match="ambiguous"):
        _pick_source(cands, "B1")
    # unique filename match still works
    cands2 = [{"name": "co2", "data": "ck-B1.nc"},
              {"name": "co2", "data": "ck-B2.nc"}]
    assert _pick_source(cands2, "B1")["data"] == "ck-B1.nc"
    # single candidate needs no disambiguation
    assert _pick_source(cands[:1], "B9")["data"] == "table_one.nc"


def test_regular_grid_degenerate_resolution_raises():
    config = {
        "opacity-sources": [
            {"name": "s8", "class": "S8Fuller", "data": "s8_k_fuller.txt"}],
        "bands": ["sw"],
        "sw": {"grid-type": "regular", "wavenumber-range": [2000.0, 3000.0],
               "resolution": 5000.0, "opacity": ["s8"],
               "rt-solver": "Disort"},
    }
    species = {"S8": (0, 256.0e-3)}
    with pytest.raises(ValueError, match="resolution"):
        create_radiation_options(config, species, nlyr=4)
