"""CIA / cloud / grey attenuator and output-writer tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from pyharp_tpu.core import constants
from pyharp_tpu.opacity.base import AttenuatorOptions
from pyharp_tpu.opacity.cia import (
    XizCIA, H2H2CIA, H2HeCIA, load_xiz_table, write_xiz_table)
from pyharp_tpu.opacity.clouds import SimpleCloud, SimpleCloudOptions, Grey


@pytest.fixture
def xiz_table(tmp_path):
    wave = np.linspace(10.0, 500.0, 12)
    temps = np.linspace(60.0, 400.0, 6)
    rng = np.random.default_rng(0)
    k = rng.uniform(2.0, 8.0, (12, 6))  # negative-log cross sections
    path = str(tmp_path / "h2h2_cia.txt")
    write_xiz_table(path, wave, temps, k)
    return path, wave, temps, k


def test_xiz_roundtrip(xiz_table):
    path, wave, temps, k = xiz_table
    w2, t2, k2 = load_xiz_table(path)
    np.testing.assert_allclose(w2, wave, rtol=1e-6)
    np.testing.assert_allclose(t2, temps, rtol=1e-6)
    np.testing.assert_allclose(k2, k, rtol=1e-6)


def test_cia_forward_amagat_scaling(xiz_table):
    path, wave, temps, k = xiz_table
    op = AttenuatorOptions(type="h2_h2_cia", species_ids=(0,),
                           species_names=("H2",), species_weights=(2e-3,),
                           opacity_files=(path,))
    cia = H2H2CIA(op, dtype=jnp.float64)
    ncol, nlyr = 1, 2
    conc = jnp.full((ncol, nlyr, 1), 40.0, jnp.float64)  # mol/m^3
    out = cia.forward(conc, wavenumber=jnp.asarray(wave[3:4]),
                      temp=jnp.full((ncol, nlyr), temps[2]),
                      pres=jnp.full((ncol, nlyr), 1e5))
    assert out.shape == (1, ncol, nlyr, 1)
    amagat = 40.0 * 6.02214076e23 / constants.Lo
    want = 100.0 * np.exp(-k[3, 2]) * amagat**2
    np.testing.assert_allclose(out[0, 0, 0, 0], want, rtol=1e-10)


def test_h2he_mix_fraction(xiz_table):
    path, wave, temps, k = xiz_table
    op = AttenuatorOptions(type="h2_he_cia", species_ids=(0,),
                           species_names=("H2",), species_weights=(2e-3,),
                           opacity_files=(path,))
    a = H2HeCIA(op, dtype=jnp.float64, xhe_over_xh2=0.2)
    b = H2H2CIA(op.replace(type="h2_h2_cia"), dtype=jnp.float64)
    conc = jnp.full((1, 1, 1), 10.0, jnp.float64)
    kw = dict(wavenumber=jnp.asarray(wave[:1]),
              temp=jnp.full((1, 1), temps[0]))
    np.testing.assert_allclose(np.asarray(a.forward(conc, **kw)),
                               0.2 * np.asarray(b.forward(conc, **kw)),
                               rtol=1e-12)


def test_simple_cloud_moments():
    op = AttenuatorOptions(type="simple_cloud", species_ids=(0,),
                           species_names=("cloud",), species_weights=(0.018,))
    sc = SimpleCloud(op, SimpleCloudOptions(kext=2.0, ssa=0.5, gg=0.6, nmom=3),
                     dtype=jnp.float64)
    conc = jnp.full((1, 4, 1), 3.0, jnp.float64)
    out = np.asarray(sc.forward(conc, wavenumber=jnp.linspace(1.0, 2.0, 5)))
    assert out.shape == (5, 1, 4, 5)
    np.testing.assert_allclose(out[..., 0], 6.0)
    np.testing.assert_allclose(out[..., 1], 3.0)           # ssa * k
    np.testing.assert_allclose(out[..., 2], 0.6 * 3.0)     # g^1 ssa k
    np.testing.assert_allclose(out[..., 4], 0.6**3 * 3.0)


def test_grey_attenuator():
    op = AttenuatorOptions(type="grey", species_ids=(0,),
                           species_names=("x",), species_weights=(0.044,))
    g = Grey(op, kappa=0.5, dtype=jnp.float64)
    conc = jnp.full((2, 3, 1), 4.0, jnp.float64)
    out = np.asarray(g.forward(conc))
    assert out.shape == (1, 2, 3, 1)
    np.testing.assert_allclose(out, 2.0)


def test_cia_in_band_pipeline(xiz_table, ):
    """CIA feeds the band accumulation + DISORT end to end."""
    from pyharp_tpu.radiation.band import RadiationBand, RadiationBandOptions
    from pyharp_tpu.rt.disort.disort import DisortOptions

    path, wave, temps, k = xiz_table
    op = AttenuatorOptions(type="h2_h2_cia", species_ids=(0,),
                           species_names=("H2",), species_weights=(2e-3,),
                           opacity_files=(path,))
    nw = 3
    bop = RadiationBandOptions(
        name="cia-band", nlyr=4, ncol=1,
        wave_lower=(float(wave[0]),) * nw, wave_upper=(float(wave[-1]),) * nw,
        attenuators=(("h2h2", op),),
        disort=DisortOptions(flags="lamber,quiet,onlyfl,planck", nstr=4, nmom=4))
    band = RadiationBand(bop, dtype=jnp.float64)
    conc = jnp.full((1, 4, 1), 30.0, jnp.float64)
    dz = jnp.full((4,), 1000.0, jnp.float64)
    atm = dict(wavenumber=jnp.linspace(float(wave[0]), float(wave[-1]), nw),
               temp=jnp.full((1, 4), 200.0, jnp.float64),
               pres=jnp.full((1, 4), 1e5, jnp.float64))
    bc = dict(albedo=jnp.zeros((nw, 1)), btemp=jnp.full((nw, 1), 200.0))
    flux = band.forward(conc, dz, bc, atm)
    assert flux.shape == (nw, 1, 5, 2)
    assert np.all(np.isfinite(np.asarray(flux)))
    assert float(flux[0, 0, -1, 0]) > 0  # thermal emission escapes


def test_radiance_writers(tmp_path):
    from pyharp_tpu.utils.output import (
        write_radiance_ascii, write_radiance_bin, read_radiance_bin, vectorize)

    rad = np.random.default_rng(0).uniform(0, 1, (4, 3))
    rays = np.array([[1.0, 0.0], [0.5, 0.0], [0.5, np.pi]])
    write_radiance_ascii(str(tmp_path / "r.txt"), rad, rays,
                         wave=np.arange(4.0), header="test")
    txt = (tmp_path / "r.txt").read_text()
    assert "rays" in txt and len(txt.splitlines()) == 6

    write_radiance_bin(str(tmp_path / "r.bin"), rad, rays)
    r2, rays2 = read_radiance_bin(str(tmp_path / "r.bin"))
    np.testing.assert_allclose(r2, rad)
    np.testing.assert_allclose(rays2, rays)

    assert vectorize("a, b  c,,d") == ["a", "b", "c", "d"]
