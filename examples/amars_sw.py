"""aMars shortwave aerosol scattering example.

TPU-native re-implementation of the reference driver
``/root/reference/examples/amars_sw.cpp:198-318`` (ancient-Mars climate,
S8 + H2SO4 aerosols, 8-stream DISORT, solar beam):

* reads the 201-row p/T/mixing-ratio profile (``amars_sw.cpp:104-127``);
* regrids to ``nlyr`` uniform-pressure layers (``regrid_ptx``, :131-154);
* ideal-gas concentrations with the reference's species index swap
  (S8 = species 0 from file column 3; H2SO4 = species 1 from column 2,
  ``amars_sw.cpp:250-258``);
* hydrostatic ``dz`` (``calc_dz``, :156-172);
* blackbody TOA beam at 5772 K scaled by 0.7 and the Mars solar solid angle
  (``bb_toa_flux``, :87-102);
* DISORT flux solve and spectral integration (:174-196).

The full pipeline from concentrations to heating rates is one jitted
function; tables and profiles load once on the host.
"""

from __future__ import annotations

import functools
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

from pyharp_tpu import AttenuatorOptions, S8Fuller, H2SO4Simple
from pyharp_tpu.rt import Disort, DisortOptions
from pyharp_tpu.tables.ascii import read_aerosol_profile

R_GAS = 8.314472          # amars_sw.cpp:211
G_MARS = 3.711
MEAN_MOL_WEIGHT = 0.044   # CO2
CP = 844.0                # J/(kg K)
SOLAR_TEMP = 5772.0
LUM_SCALE = 0.7


def short_wavenumber_grid(nwave: int, dtype=jnp.float64):
    """2000-50000 cm^-1 (amars_sw.cpp:74-79)."""
    return jnp.linspace(2000.0, 50000.0, nwave, dtype=dtype)


def bb_toa_flux(wave, temp=SOLAR_TEMP, fscale=LUM_SCALE):
    """Blackbody TOA spectral flux [W/(m^2 cm^-1)] (amars_sw.cpp:87-102)."""
    c1 = 1.19144e-5 * 1e-3
    c2 = 1.4388
    sr_sun = 2.92842e-5  # angular size of the sun at mars
    return fscale * sr_sun * c1 * wave**3 / (jnp.exp(c2 * wave / temp) - 1.0)


def regrid_ptx(nlyr: int, p: np.ndarray, T: np.ndarray, mr: np.ndarray):
    """Uniform-pressure regrid, bottom-up layers (amars_sw.cpp:131-154)."""
    p_min, p_max = p.min(), p.max()
    T_min, T_max = T.min(), T.max()
    i = np.arange(nlyr)
    new_p = np.empty(nlyr)
    new_T = np.empty(nlyr)
    new_p[nlyr - 1 - i] = p_min + i * (p_max - p_min) / (nlyr - 1)
    new_T[nlyr - 1 - i] = T_min + i * (T_max - T_min) / (nlyr - 1)
    # file p axis is descending; np.interp needs ascending
    order = np.argsort(p)
    new_mr = np.stack([np.interp(new_p, p[order], m[order]) for m in mr])
    return new_p, new_T, new_mr


def calc_dz(nlyr, new_p, new_rho, g=G_MARS):
    """Hydrostatic layer thickness (amars_sw.cpp:156-172)."""
    dz = np.ones(nlyr)
    for i in range(nlyr - 1):
        dz[i] = (new_p[i] - new_p[i + 1]) / (g * new_rho[i])
    dz[nlyr - 1] = 2.0 * dz[nlyr - 2]
    return dz


def load_atmosphere(nlyr: int, profile="aerosol_output_data.txt"):
    """Host-side profile ingestion + regrid. Returns numpy arrays."""
    arr = read_aerosol_profile(profile)
    p = arr[:, 0] * 1e5  # bar -> Pa
    T = arr[:, 1]
    mr = arr[:, 2:4].T   # (2, npts): [SO4AER, S8AER]
    new_p, new_T, new_mr = regrid_ptx(nlyr, p, T, mr)
    new_rho = new_p * MEAN_MOL_WEIGHT / (R_GAS * new_T)
    # species index swap (amars_sw.cpp:250-258): conc[...,0]=S8, [...,1]=H2SO4
    conc = np.stack([
        new_mr[1] * new_p / (R_GAS * new_T),
        new_mr[0] * new_p / (R_GAS * new_T),
    ], axis=-1)[None, :, :]  # (ncol=1, nlyr, 2)
    dz = calc_dz(nlyr, new_p, new_rho)
    return dict(p=new_p, T=new_T, mr=new_mr, rho=new_rho, conc=conc, dz=dz,
                p_raw=p, mr_raw=mr)


def build(nwave=500, ncol=1, nlyr=40, nstr=8, dtype=jnp.float32):
    """Build the jittable forward step and its inputs."""
    op = AttenuatorOptions(
        species_names=("S8", "H2SO4"),
        species_weights=(256.0e-3, 98.0e-3),
    )
    s8 = S8Fuller(op.replace(species_ids=(0,),
                             opacity_files=("s8_k_fuller.txt",)), dtype=dtype)
    h2so4 = H2SO4Simple(op.replace(species_ids=(1,),
                                   opacity_files=("h2so4.txt",)), dtype=dtype)
    disort = Disort(DisortOptions(
        flags="lamber,quiet,onlyfl,intensity_correction,"
              "old_intensity_correction",
        nwave=nwave, ncol=ncol, nlyr=nlyr, nstr=nstr, nmom=nstr))

    atm = load_atmosphere(nlyr)
    wave = short_wavenumber_grid(nwave, dtype)

    def forward(conc, dz, wave):
        """conc (ncol,nlyr,2), dz (nlyr,), wave (nwave,) -> outputs dict."""
        prop = s8.forward(conc, wavenumber=wave) + h2so4.forward(
            conc, wavenumber=wave)
        # extinction -> optical thickness, mean single-scattering albedo
        tau = prop[..., 0] * dz[None, None, :]
        ssa = prop[..., 1] / prop[..., 0]
        prop = jnp.stack([tau, ssa], axis=-1)

        nw = wave.shape[0]
        bc = dict(
            fbeam=jnp.broadcast_to(bb_toa_flux(wave)[:, None], (nw, ncol)),
            umu0=jnp.ones((nw, ncol), dtype),
            albedo=jnp.ones((nw, ncol), dtype),
        )
        flux = disort.forward(prop, bc)  # (nwave, ncol, nlvl, 2) bottom-up

        # spectral integration on the uniform wavenumber grid
        d_lambda = wave[1] - wave[0]
        integrated = flux.sum(axis=0) * d_lambda      # (ncol, nlvl, 2)
        return dict(
            flux=flux,
            integrated=integrated,
            tot_flux_down_surf=integrated[:, 0, 1],
            tot_flux_down_toa=integrated[:, -1, 1],
        )

    inputs = (
        jnp.asarray(atm["conc"], dtype),
        jnp.asarray(atm["dz"], dtype),
        wave,
    )
    return forward, inputs, atm


def heating_rates(integrated, atm):
    """dT/ds = -(1/rho cp) dF_net/dz (amars_sw.cpp:290-301)."""
    up = np.asarray(integrated[0, :, 0])
    dn = np.asarray(integrated[0, :, 1])
    fnet = up - dn
    dz = atm["dz"]
    return -(fnet[1:] - fnet[:-1]) / (atm["rho"] * CP * dz)


def enable_compile_cache():
    """Persistent compile cache (first remote-TPU Mosaic compile of the full
    solver graph costs minutes; later runs hit /tmp/jax_cache_tpu).  CPU is
    excluded: XLA:CPU AOT reload is unreliable here (see tests/conftest.py).
    """
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    import time

    enable_compile_cache()
    forward, inputs, atm = build()
    jitted = jax.jit(forward)
    out = jax.block_until_ready(jitted(*inputs))
    t0 = time.time()
    out = jax.block_until_ready(jitted(*inputs))
    dt = time.time() - t0

    print(f"tot_flux_down_surf: {float(out['tot_flux_down_surf'][0]):.4f} W/m^2")
    print(f"tot_flux_down_toa: {float(out['tot_flux_down_toa'][0]):.4f} W/m^2")
    print(f"forward time: {dt*1e3:.1f} ms")

    dT_ds = heating_rates(out["integrated"], atm)
    with open("dT_ds.txt", "w") as f:
        f.write("#p[Pa] dT_ds[K/s]\n")
        for pk, hk in zip(atm["p"], dT_ds):
            f.write(f"{pk} {hk}\n")

    with open("mix.txt", "w") as f:
        f.write("#p_new[Pa] mr(new)(0) mr(new)(1) p_atmos[Pa] mr(atmos)(0) "
                "mr(atmos)(1)\n")
        nlyr = len(atm["p"])
        for k in range(nlyr):
            f.write(f"{atm['p'][k]} {atm['mr'][0][k]} {atm['mr'][1][k]} "
                    f"{atm['p_raw'][k]} {atm['mr_raw'][0][k]} "
                    f"{atm['mr_raw'][1][k]}\n")
        for k in range(nlyr, min(200, len(atm["p_raw"]))):
            f.write(f"0 0 0 {atm['p_raw'][k]} {atm['mr_raw'][0][k]} "
                    f"{atm['mr_raw'][1][k]}\n")


if __name__ == "__main__":
    main()
