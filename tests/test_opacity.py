"""Opacity module tests.

Mirrors the reference test intent (``/root/reference/tests/test_attenuator.cpp``)
but with actual numeric assertions (the reference tests only printed).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pyharp_tpu import (
    AttenuatorOptions,
    S8Fuller,
    H2SO4Simple,
    RFM,
    write_rfm_table,
    read_weights_rfm,
)
from pyharp_tpu.tables.ascii import read_data_table


def aerosol_opts():
    return AttenuatorOptions(
        species_names=("S8", "H2SO4"),
        species_weights=(256.0e-3, 98.0e-3),
    )


def test_s8_table_load_and_weight_conversion():
    op = aerosol_opts().replace(species_ids=(0,), opacity_files=("s8_k_fuller.txt",))
    s8 = S8Fuller(op, dtype=jnp.float64)
    raw = read_data_table("s8_k_fuller.txt")
    assert s8.kwave.shape[0] == raw.shape[0] == 233  # 234 lines incl. header
    # extinction converted m^2/kg -> m^2/mol by molecular weight 256 g/mol
    np.testing.assert_allclose(s8.kdata[:, 0], raw[:, 1] * 256e-3, rtol=1e-12)
    np.testing.assert_allclose(s8.kdata[:, 1], raw[:, 2], rtol=1e-12)


def test_aerosol_forward_shape_and_values():
    op = aerosol_opts().replace(species_ids=(0,), opacity_files=("s8_k_fuller.txt",))
    s8 = S8Fuller(op, dtype=jnp.float64)
    ncol, nlyr = 2, 5
    conc = jnp.ones((ncol, nlyr, 2), jnp.float64) * 3.0

    # exact table node: wavelength hit
    wl = s8.kwave[10:11]
    out = s8.forward(conc, wavelength=wl)
    assert out.shape == (1, ncol, nlyr, 2)
    att = s8.kdata[10, 0] * 3.0
    np.testing.assert_allclose(out[0, :, :, 0], att, rtol=1e-12)
    np.testing.assert_allclose(out[0, :, :, 1], att * s8.kdata[10, 1], rtol=1e-12)


def test_aerosol_wavenumber_conversion():
    op = aerosol_opts().replace(species_ids=(1,), opacity_files=("h2so4.txt",))
    h2so4 = H2SO4Simple(op, dtype=jnp.float64)
    conc = jnp.ones((1, 1, 2), jnp.float64)
    wl = np.asarray(h2so4.kwave[5])
    wn = 1.0e4 / wl  # um -> cm^-1 (s8_fuller.cpp:82)
    a = h2so4.forward(conc, wavelength=jnp.array([wl]))
    b = h2so4.forward(conc, wavenumber=jnp.array([wn]))
    np.testing.assert_allclose(a, b, rtol=1e-10)


def test_aerosol_requires_wave_kwarg():
    op = aerosol_opts().replace(species_ids=(0,), opacity_files=("s8_k_fuller.txt",))
    s8 = S8Fuller(op, dtype=jnp.float64)
    with pytest.raises(ValueError):
        s8.forward(jnp.ones((1, 1, 2)))


@pytest.fixture
def synthetic_rfm(tmp_path):
    """Schema-exact synthetic k-table (real tables are gitignored upstream)."""
    rng = np.random.default_rng(0)
    nwave, npres, ntemp = 8, 6, 5
    wave = np.linspace(1.0, 150.0, nwave)
    pres = np.logspace(5.5, 2.0, npres)  # descending Pa, tests axis flip
    tgrid = np.linspace(-50, 50, ntemp)
    reftemp = np.linspace(280, 180, npres)
    kco2 = rng.uniform(-3, 3, (nwave, npres, ntemp))
    kh2o = rng.uniform(-3, 3, (nwave, npres, ntemp))
    w = np.full(nwave, 1.0 / nwave)
    path = tmp_path / "synthetic-ck-B1.nc"
    write_rfm_table(path, wave, pres, tgrid, reftemp,
                    {"CO2": kco2, "H2O": kh2o}, weights=w)
    return dict(path=str(path), wave=wave, pres=pres, tgrid=tgrid,
                reftemp=reftemp, kco2=kco2, w=w)


def rfm_opts(path):
    return AttenuatorOptions(
        species_names=("CO2", "H2O"),
        species_weights=(44.0e-3, 18.0e-3),
        species_ids=(0,),
        opacity_files=(path,),
    )


def test_rfm_load(synthetic_rfm):
    rfm = RFM.from_options(rfm_opts(synthetic_rfm["path"]), dtype=jnp.float64)
    assert rfm.kdata.shape == (8, 6, 5)
    # pressure axis was descending in file -> flipped ascending in ln p
    lnp = np.asarray(rfm.klnp)
    assert np.all(np.diff(lnp) > 0)
    np.testing.assert_allclose(np.exp(lnp), np.sort(synthetic_rfm["pres"]), rtol=1e-12)


def test_rfm_get_reftemp_at_nodes(synthetic_rfm):
    rfm = RFM.from_options(rfm_opts(synthetic_rfm["path"]), dtype=jnp.float64)
    got = rfm.get_reftemp(rfm.klnp[None, :])
    np.testing.assert_allclose(got[0], rfm.krefatm, rtol=1e-12)


def test_rfm_forward_exact_node(synthetic_rfm):
    rfm = RFM.from_options(rfm_opts(synthetic_rfm["path"]), dtype=jnp.float64)
    # choose pres/temp exactly on table nodes: anomaly grid node it=2
    ip = 3
    pres_val = float(np.exp(rfm.klnp[ip]))
    t_anom = float(rfm.ktemp[2])
    t_val = float(rfm.krefatm[ip]) + t_anom
    conc = 2.5 * jnp.ones((1, 1, 2), jnp.float64)
    out = rfm.forward(
        conc,
        pres=jnp.full((1, 1), pres_val),
        temp=jnp.full((1, 1), t_val),
    )
    assert out.shape == (8, 1, 1, 1)
    want = 1e-3 * np.exp(np.asarray(rfm.kdata)[:, ip, 2]) * 2.5
    np.testing.assert_allclose(out[:, 0, 0, 0], want, rtol=1e-10)


def test_rfm_forward_interpolates_lnk(synthetic_rfm):
    """Between nodes, ln k (not k) is interpolated linearly (rfm.cpp:166-168)."""
    rfm = RFM.from_options(rfm_opts(synthetic_rfm["path"]), dtype=jnp.float64)
    ip = 2
    lnp_mid = 0.5 * (rfm.klnp[ip] + rfm.klnp[ip + 1])
    # keep anomaly exactly on a node to isolate the pressure axis
    t_anom = float(rfm.ktemp[1])
    reft = rfm.get_reftemp(jnp.full((1, 1), lnp_mid))
    conc = jnp.ones((1, 1, 2), jnp.float64)
    out = rfm.forward(
        conc,
        pres=jnp.exp(jnp.full((1, 1), lnp_mid)),
        temp=reft + t_anom,
    )
    k = np.asarray(rfm.kdata)
    want = 1e-3 * np.exp(0.5 * (k[:, ip, 1] + k[:, ip + 1, 1]))
    np.testing.assert_allclose(out[:, 0, 0, 0], want, rtol=1e-10)


def test_read_weights(synthetic_rfm):
    w = read_weights_rfm(synthetic_rfm["path"])
    np.testing.assert_allclose(w, synthetic_rfm["w"], rtol=1e-12)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-12)
