"""On-chip fused multi-band execution.

Compiles the Radiation YAML path with ``fuse_bands=True`` on the hardware
(Pallas flux-fused kernels inside a single batched multi-band solve) and
checks it against the sequential per-band loop.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pyharp_tpu import write_rfm_table
from pyharp_tpu.radiation import Radiation
from pyharp_tpu.radiation.factory import create_radiation_options


def test_fused_bands_on_chip(tmp_path):
    ng, nlyr, ncol = 8, 30, 64
    rng = np.random.default_rng(9)
    tables = {}
    for b in ("b1", "b2", "b3"):
        path = str(tmp_path / f"tpu-ck-{b.upper()}.nc")
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
    ro = create_radiation_options(config, {"CO2": (0, 44.0e-3)},
                                  nlyr=nlyr, ncol=ncol)
    rad = Radiation(ro)

    conc = jnp.ones((ncol, nlyr, 1), jnp.float32)
    dz = jnp.full((nlyr,), 500.0, jnp.float32)
    atm = dict(pres=jnp.full((ncol, nlyr), 1.0e5, jnp.float32),
               temp=jnp.full((ncol, nlyr), 255.0, jnp.float32))
    bc = dict(albedo=0.1, btemp=280.0)

    seq = np.asarray(jax.jit(
        lambda c, d: rad.forward(c, d, bc, atm))(conc, dz))
    fus = np.asarray(jax.jit(
        lambda c, d: rad.forward(c, d, bc, atm, fuse_bands=True))(conc, dz))
    assert np.all(np.isfinite(fus))
    scale = np.abs(seq).max()
    np.testing.assert_allclose(fus, seq, atol=2e-5 * scale, rtol=2e-4)
