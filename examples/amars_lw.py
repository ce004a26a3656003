"""aMars longwave correlated-k thermal emission example.

TPU-native re-implementation of the reference driver
``/root/reference/examples/amars_lw.cpp:40-90`` (CO2 + H2O correlated-k
tables, 8-stream DISORT with Planck sources, 1-150 cm^-1 band):

* RFM-schema k-tables for CO2/H2O (``amars_lw.cpp:41-49``).  The reference
  repo gitignores its real ``amarsw-ck-B1.nc`` table, so this example
  synthesizes a schema-exact stand-in when none is found (same path the
  tests use);
* uniform atmosphere ``pres = 10 bar, temp = 300 K`` (``amars_lw.cpp:62-64``);
* ``temf = layer2level(temp)`` level temperatures for the Planck source
  (``amars_lw.cpp:76``);
* g-point quadrature band reduction ``bflx = sum_g w_g F_g``
  (``amars_lw.cpp:84-88``).
"""

from __future__ import annotations

import os
import sys

# runnable from a clean shell: if the package is not installed, import it
# from the repo checkout this file lives in (sys.path insertion does NOT
# disturb PYTHONPATH, so the axon TPU site hook keeps working)
try:
    import pyharp_tpu  # noqa: F401
except ModuleNotFoundError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pyharp_tpu import (
    AttenuatorOptions,
    RFM,
    Layer2LevelOptions,
    layer2level,
    read_weights_rfm,
    write_rfm_table,
)
from pyharp_tpu.rt import Disort, DisortOptions

WMIN, WMAX = 1.0, 150.0


def ensure_ck_table(path="amarsw-ck-B1.nc", ng=8):
    """Synthesize an RFM-schema ck table if the real one is absent."""
    if os.path.exists(path):
        return path
    rng = np.random.default_rng(7)
    npres, ntemp = 12, 7
    gpoints = np.linspace(WMIN, WMAX, ng)   # nominal per-g wavenumber tags
    pres = np.logspace(6.3, 1.0, npres)     # 20 bar .. 0.1 mbar, descending
    tgrid = np.linspace(-60.0, 60.0, ntemp)
    reftemp = np.linspace(320.0, 150.0, npres)
    # smooth plausible ln-k surfaces (m^2/kmol), increasing with pressure
    lnp = np.log(pres)

    def synth(base):
        k = (base
             + 1.2 * (lnp[None, :, None] - lnp.mean()) / lnp.std()
             + 0.01 * tgrid[None, None, :]
             - 0.5 * np.linspace(0, 3, ng)[:, None, None])
        return k + 0.1 * rng.standard_normal((ng, npres, ntemp))

    # Gauss-Legendre style g-point weights
    x, w = np.polynomial.legendre.leggauss(ng)
    weights = w / w.sum()
    write_rfm_table(path, gpoints, pres, tgrid, reftemp,
                    {"CO2": synth(-2.0), "H2O": synth(-3.0)}, weights=weights)
    return path


def build(ncol=1, nlyr=40, nstr=8, dtype=jnp.float32, table=None):
    table = table or ensure_ck_table()
    op = AttenuatorOptions(
        species_names=("CO2", "H2O"),
        species_weights=(44.0e-3, 18.0e-3),
    )
    co2 = RFM.from_options(op.replace(species_ids=(0,),
                                      opacity_files=(table,)), dtype=dtype)
    h2o = RFM.from_options(op.replace(species_ids=(1,),
                                      opacity_files=(table,)), dtype=dtype)
    nwave = co2.kdata.shape[0]

    disort = Disort(DisortOptions(
        flags="lamber,quiet,onlyfl,planck,intensity_correction,"
              "old_intensity_correction",
        nwave=nwave, ncol=ncol, nlyr=nlyr, nstr=nstr, nmom=nstr,
        wave_lower=(WMIN,) * nwave, wave_upper=(WMAX,) * nwave))

    weights = jnp.asarray(read_weights_rfm(table), dtype)

    def forward(conc, pres, temp):
        """conc (ncol,nlyr,2), pres/temp (ncol,nlyr) -> outputs dict."""
        prop = co2.forward(conc, pres=pres, temp=temp) + h2o.forward(
            conc, pres=pres, temp=temp)
        # assuming dz = 1 (amars_lw.cpp:79): attenuation == optical thickness
        bc = dict(
            albedo=jnp.ones((nwave, ncol), dtype),
            btemp=jnp.full((nwave, ncol), 300.0, dtype),
        )
        temf = layer2level(temp, Layer2LevelOptions(check_positivity=False))
        flux = disort.forward(prop, bc, temf)
        bflx = jnp.einsum("g,g...->...", weights, flux)
        return dict(flux=flux, bflx=bflx)

    conc = jnp.ones((ncol, nlyr, 2), dtype)
    pres = jnp.full((ncol, nlyr), 10.0e5, dtype)
    temp = jnp.full((ncol, nlyr), 300.0, dtype)
    return forward, (conc, pres, temp)


def main():
    import time

    if jax.default_backend() != "cpu":
        # persistent compile cache (see examples/amars_sw.py)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    forward, inputs = build()
    jitted = jax.jit(forward)
    out = jax.block_until_ready(jitted(*inputs))
    t0 = time.time()
    out = jax.block_until_ready(jitted(*inputs))
    dt = time.time() - t0
    print("flux shape:", out["flux"].shape)
    print("band flux (bottom levels):")
    print(np.asarray(out["bflx"][0, :4]))
    print("band flux (top levels):")
    print(np.asarray(out["bflx"][0, -4:]))
    print(f"forward time: {dt*1e3:.1f} ms")


if __name__ == "__main__":
    main()
