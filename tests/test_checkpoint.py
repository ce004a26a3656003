"""Checkpoint save/restore of table-backed module state (SURVEY.md 5.4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pyharp_tpu import AttenuatorOptions, S8Fuller
from pyharp_tpu.radiation import RadiationBand, RadiationBandOptions
from pyharp_tpu.rt.disort.disort import DisortOptions
from pyharp_tpu.utils import checkpoint

SPECIES = dict(species_ids=(0,), species_names=("S8",),
               species_weights=(0.256,))


def make_s8(dtype=jnp.float32):
    return S8Fuller(AttenuatorOptions(type="s8_fuller",
                                      opacity_files=("s8_k_fuller.txt",),
                                      **SPECIES), dtype=dtype)


def test_roundtrip_attenuator(tmp_path):
    a = make_s8()
    p = str(tmp_path / "s8.npz")
    checkpoint.save(p, a)

    b = make_s8()
    # corrupt, then restore
    b = type(b)(kwave=b.kwave * 0, kdata=b.kdata * 0, options=b.options)
    b = checkpoint.load(p, b)
    np.testing.assert_array_equal(np.asarray(b.kwave), np.asarray(a.kwave))
    np.testing.assert_array_equal(np.asarray(b.kdata), np.asarray(a.kdata))

    conc = jnp.ones((2, 3, 1))
    wav = jnp.linspace(0.3, 1.0, 4)
    np.testing.assert_array_equal(
        np.asarray(a.forward(conc, wavelength=wav)),
        np.asarray(b.forward(conc, wavelength=wav)))


def test_dtype_follows_module(tmp_path):
    a64 = make_s8(dtype=jnp.float64)
    p = str(tmp_path / "s8_64.npz")
    checkpoint.save(p, a64)
    b32 = checkpoint.load(p, make_s8(dtype=jnp.float32))
    assert b32.kdata.dtype == jnp.float32


def test_shape_mismatch_raises(tmp_path):
    a = make_s8()
    p = str(tmp_path / "s8.npz")
    checkpoint.save(p, a)
    state = dict(np.load(p))
    key = [k for k in state if k.endswith("kwave")][0]
    state[key] = state[key][:-1]
    with pytest.raises(ValueError, match="shape mismatch"):
        checkpoint.load_state(a, state)


def test_band_roundtrip(tmp_path):
    bop = RadiationBandOptions(
        name="sw", nlyr=4, ncol=1, wave_lower=(2000.0,), wave_upper=(9999.0,),
        attenuators=(("s8", AttenuatorOptions(
            type="s8_fuller", opacity_files=("s8_k_fuller.txt",), **SPECIES)),),
        disort=DisortOptions(flags="lamber,quiet,onlyfl", nstr=4, nmom=4,
                             nwave=1, ncol=1, nlyr=4))
    band = RadiationBand(bop)
    p = str(tmp_path / "band.npz")
    checkpoint.save(p, band)
    sd = checkpoint.state_dict(band)
    assert any(k.startswith("s8/") for k in sd)
    band2 = RadiationBand(bop)
    band2 = checkpoint.load(p, band2)
    np.testing.assert_array_equal(
        np.asarray(band2.attenuators["s8"].kdata),
        np.asarray(band.attenuators["s8"].kdata))

