"""aMars YAML-driven multi-band radiation example.

Drives the FULL ``Radiation`` path end-to-end from a band configuration
file, the way the reference's legacy factory intended
(``/root/reference/src/radiation/radiation_bands_factory.cpp_:16-51``,
configs ``examples/amarsw-ck.yaml`` / ``amarsw-lbl.yaml``):

    YAML -> create_radiation_options -> Radiation -> forward -> band fluxes

Two configurations ship alongside this driver:

* ``amarsw-ck.yaml``  — five correlated-k thermal bands (g-point quadrature);
* ``amarsw-lbl.yaml`` — the same bands on regular (line-by-line) grids with
  per-bin Planck sub-band integration.

The reference gitignores its real RFM NetCDF tables, so this driver
synthesizes schema-exact stand-ins per band (same path the LW example and
the tests use).  Physics setup mirrors ``examples/amars_lw.cpp:62-74``:
uniform 10 bar / 300 K CO2-dominated atmosphere, Lambertian surface at
300 K.

Run:  python examples/amars_yaml.py [--config ck|lbl] [--resolution R]
"""

from __future__ import annotations

import argparse
import os
import sys

try:
    import pyharp_tpu  # noqa: F401
except ModuleNotFoundError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from pyharp_tpu import write_rfm_table
from pyharp_tpu.radiation import Radiation
from pyharp_tpu.radiation.factory import create_radiation_options

EXAMPLES_DIR = os.path.dirname(os.path.abspath(__file__))
SPECIES = {"CO2": (0, 44.0e-3), "H2O": (1, 18.0e-3)}


def synth_table(path: str, wave: np.ndarray, species: str,
                ck_weights: bool) -> None:
    """Write a schema-exact RFM stand-in table (rfm.cpp:36-114 layout)."""
    rng = np.random.default_rng(abs(hash(os.path.basename(path))) % 2**32)
    npres, ntemp = 12, 7
    pres = np.logspace(6.3, 1.0, npres)     # 20 bar .. 0.1 mbar, descending
    tgrid = np.linspace(-60.0, 60.0, ntemp)
    reftemp = np.linspace(320.0, 150.0, npres)
    lnp = np.log(pres)
    nw = len(wave)
    base = -2.0 if species == "CO2" else -3.0
    k = (base
         + 1.2 * (lnp[None, :, None] - lnp.mean()) / lnp.std()
         + 0.01 * tgrid[None, None, :]
         - 0.5 * np.linspace(0, 3, nw)[:, None, None]
         + 0.1 * rng.standard_normal((nw, npres, ntemp)))
    weights = None
    if ck_weights:
        _, w = np.polynomial.legendre.leggauss(nw)
        weights = w / w.sum()
    write_rfm_table(path, wave, pres, tgrid, reftemp, {species: k},
                    weights=weights)


def ensure_tables(node: dict, ng: int = 8) -> None:
    """Create any missing per-band tables referenced by the config.

    A table left by an earlier run at a DIFFERENT ``--resolution`` is
    regenerated: the RFM table's wavenumber grid defines the band's
    spectral sampling (as in the reference, rfm.cpp:36-58), so a stale
    grid would disagree with the factory's per-bin band edges.
    """
    from pyharp_tpu.tables.rfm import load_rfm_table

    for bname in node.get("bands", ()):
        b = node[bname]
        wmin, wmax = b["wavenumber-range"]
        for src in node.get("opacity-sources", []):
            if bname.lower() not in str(src.get("data", "")).lower():
                continue
            path = src["data"]
            if b.get("grid-type") == "cktable":
                wave = np.linspace(wmin, wmax, ng)
            else:
                res = float(b.get("resolution", 1.0))
                nw = max(int(round((wmax - wmin) / res)) + 1, 2)
                wave = wmin + res * np.arange(nw)
            if os.path.exists(path):
                try:
                    tbl = load_rfm_table(path, src["name"])
                    if (tbl.wavenumber.shape[0] == wave.shape[0]
                            and np.allclose(tbl.wavenumber, wave)):
                        continue
                except Exception:
                    pass
                os.remove(path)      # stale grid: regenerate
            synth_table(path, wave, src["name"],
                        ck_weights=b.get("grid-type") == "cktable")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=("ck", "lbl"), default="ck")
    ap.add_argument("--resolution", type=float, default=None,
                    help="override regular-grid resolution [cm^-1] "
                         "(the shipped lbl config uses 0.1; pass e.g. 2.0 "
                         "for a quick run)")
    ap.add_argument("--nlyr", type=int, default=40)
    ap.add_argument("--fuse", action="store_true",
                    help="fold compatible bands into one batched solve "
                         "(identical results, one launch instead of five)")
    args = ap.parse_args()

    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    with open(os.path.join(EXAMPLES_DIR, f"amarsw-{args.config}.yaml")) as f:
        node = yaml.safe_load(f)
    if args.resolution is not None:
        for bname in node.get("bands", ()):
            if node[bname].get("grid-type") == "regular":
                node[bname]["resolution"] = args.resolution
    ensure_tables(node)

    nlyr, ncol = args.nlyr, 1
    dtype = jnp.float32
    ro = create_radiation_options(node, SPECIES, nlyr=nlyr, ncol=ncol)
    rad = Radiation(ro, dtype=dtype)

    # uniform aMars-ish atmosphere (amars_lw.cpp:62-74): dz = 1 m layers so
    # attenuation [1/m] equals optical thickness per layer
    conc = jnp.ones((ncol, nlyr, 2), dtype)
    dz = jnp.ones((nlyr,), dtype)
    atm = dict(pres=jnp.full((ncol, nlyr), 10.0e5, dtype),
               temp=jnp.full((ncol, nlyr), 300.0, dtype))
    bc = dict(albedo=1.0, btemp=300.0)   # scalars broadcast per band

    @jax.jit
    def step(conc, dz):
        return rad.forward(conc, dz, bc, atm, return_aux=True,
                           fuse_bands=args.fuse)

    import time
    total, aux = jax.block_until_ready(step(conc, dz))
    t0 = time.time()
    total, aux = jax.block_until_ready(step(conc, dz))
    dt = time.time() - t0

    print(f"config: amarsw-{args.config}.yaml  bands: {list(ro.bands)}")
    for name in ro.bands:
        flux = aux[f"radiation/{name}/flux"]
        bflx = rad.bands[name].spectral_reduce(flux)
        print(f"  {name}: nwave={flux.shape[0]:5d}  "
              f"TOA up {float(bflx[0, -1, 0]):10.4f}  "
              f"surf dn {float(bflx[0, 0, 1]):10.4f}  W/m^2")
    print(f"total: TOA up {float(total[0, -1, 0]):.4f} W/m^2, "
          f"surf dn {float(total[0, 0, 1]):.4f} W/m^2")
    print(f"forward time: {dt*1e3:.1f} ms")


if __name__ == "__main__":
    main()
