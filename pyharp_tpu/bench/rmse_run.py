"""Produce RMSE.md: the recorded flux-accuracy matrix vs the independent
compiled oracles (C Monte Carlo transport + Chandrasekhar H-function).

Usage:  python -m pyharp_tpu.bench.rmse_run [--photons 1e8] [--out RMSE.md]

Matrix (the BASELINE.md acceptance shape: beam/thermal x nstr 4/8/16 x
thin/thick, plus HG anisotropy and the exact semi-infinite anchor):

  sources:      beam (mu0=0.6), beam+HG(g=0.7), thermal (linear-in-tau B),
                fisot
  atmospheres:  thin (tau_tot = 0.4), thick (tau_tot = 8)
  streams:      nstr = 4, 8, 16

Reported: relative RMSE over all levels of (flup, fldn_total), scale =
max MC flux; MC 1-sigma noise floor at the configured photon count is
quoted alongside.  Runs the solver in f64 on CPU (the validation dtype;
the f32 TPU path is pinned against this one by the hardware tier).
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys

import numpy as np


def _solver_fluxes(dtau, ssa, g, albedo, nstr, source, blev=None,
                   bsurf=None, mu0=0.6):
    import jax.numpy as jnp

    from ..rt.disort.disort import Disort, DisortOptions

    nlyr = len(dtau)
    nmom = nstr
    prop = np.zeros((1, 1, nlyr, 2 + nmom))
    prop[0, 0, :, 0] = np.asarray(dtau)[::-1]
    prop[0, 0, :, 1] = ssa
    if g:
        prop[0, 0, :, 2:] = (g ** np.arange(1, nmom + 1))[None, :]
    flags = "lamber,quiet,onlyfl"
    bc = dict(albedo=jnp.full((1, 1), float(albedo)))
    temf = None
    if source == "beam":
        bc["fbeam"] = jnp.full((1, 1), 1.0)
        bc["umu0"] = jnp.full((1, 1), float(mu0))
    elif source == "fisot":
        bc["fisot"] = jnp.full((1, 1), 1.0)
    elif source == "thermal":
        from ..core.constants import stefanBoltzmann as sig

        flags += ",planck"
        tlev = (np.pi * np.asarray(blev) / sig) ** 0.25
        temf = jnp.asarray(tlev[::-1][None, :])
        bc["btemp"] = jnp.full((1, 1), float((np.pi * bsurf / sig) ** 0.25))
    ds = Disort(DisortOptions(flags=flags, nwave=1, ncol=1, nlyr=nlyr,
                              nstr=nstr, nmom=nmom))
    flux = np.asarray(ds.forward(jnp.asarray(prop), bc, temf))[0, 0]
    return flux[::-1, 0], flux[::-1, 1]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--photons", type=float, default=1e8)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "RMSE.md"))
    args = ap.parse_args(argv)
    n_ph = int(args.photons)

    sys.path.insert(0, os.path.dirname(args.out))
    from tests.oracle.mc import (mc_beam_flux, mc_isotropic_flux,
                                 mc_thermal_flux)
    from tests.oracle.hfunction import plane_albedo

    atmos = {
        "thin": np.full(4, 0.1),
        "thick": np.full(8, 1.0),
    }
    rows = []
    import time

    for aname, dtau in atmos.items():
        nlyr = len(dtau)
        blev = np.linspace(1.0, 3.0, nlyr + 1)
        cases = [
            ("beam iso w0=0.9", dict(ssa=0.9, g=0.0, albedo=0.2,
                                     source="beam")),
            ("beam HG g=0.7 w0=0.9", dict(ssa=0.9, g=0.7, albedo=0.2,
                                          source="beam")),
            ("thermal w0=0.35", dict(ssa=0.35, g=0.0, albedo=0.15,
                                     source="thermal", blev=blev,
                                     bsurf=3.5)),
            ("fisot w0=0.8", dict(ssa=0.8, g=0.0, albedo=0.3,
                                  source="fisot")),
        ]
        for cname, kw in cases:
            t0 = time.perf_counter()
            if kw["source"] == "beam":
                mup, mdn = mc_beam_flux(dtau, kw["ssa"], kw["g"],
                                        kw["albedo"], 0.6, 1.0,
                                        n_photons=n_ph)
            elif kw["source"] == "fisot":
                mup, mdn = mc_isotropic_flux(dtau, kw["ssa"], kw["g"],
                                             kw["albedo"], 1.0,
                                             n_photons=n_ph)
            else:
                mup, mdn = mc_thermal_flux(dtau, kw["ssa"], kw["g"],
                                           kw["albedo"], kw["blev"],
                                           kw["bsurf"], n_photons=n_ph)
            t_mc = time.perf_counter() - t0
            scale = max(mup.max(), mdn.max())
            for nstr in (4, 8, 16):
                up, dn = _solver_fluxes(dtau, kw["ssa"], kw["g"],
                                        kw["albedo"], nstr, kw["source"],
                                        blev=kw.get("blev"),
                                        bsurf=kw.get("bsurf"))
                r = np.sqrt(np.mean(np.concatenate(
                    [(up - mup), (dn - mdn)]) ** 2)) / scale
                rows.append((aname, cname, nstr, r, t_mc))

    # exact H-function anchor
    anchor = []
    for w0, mu0 in [(0.3, 0.5), (0.9, 0.8), (0.99, 0.2)]:
        up, dn = _solver_fluxes(np.full(32, 2.0), w0, 0.0, 0.0, 16,
                                "beam", mu0=mu0)
        got = up[0] / mu0
        want = plane_albedo(w0, mu0)
        anchor.append((w0, mu0, got, want, abs(got - want) / want))

    noise = 1.0 / np.sqrt(n_ph) * 3.0   # ~3x single-tally sigma, scaled
    with open(args.out, "w") as f:
        f.write("# RMSE — flux accuracy vs independent compiled oracles\n\n")
        f.write(
            "The BASELINE acceptance names cdisort; its C source is "
            "fetched from an external repository at configure time and is "
            "absent from the reference checkout (`cmake/pydisort.cmake`), "
            "and this environment has no network, so the independent "
            "references are (a) a compiled C Monte Carlo photon transport "
            "(`csrc/mc_oracle.c` — different algorithm, different "
            "language, zero shared code) and (b) the exact Chandrasekhar "
            "H-function (`tests/oracle/hfunction.py`).\n\n")
        f.write(f"Date: {datetime.date.today()}; solver dtype f64 "
                f"(XLA:CPU); MC photons per case: {n_ph:.0e} "
                f"(~{noise:.1e} rel 1-sigma noise floor).\n\n")
        f.write("| atmosphere | case | nstr | rel flux RMSE | MC wall |\n")
        f.write("|---|---|---|---|---|\n")
        for aname, cname, nstr, r, t_mc in rows:
            f.write(f"| {aname} | {cname} | {nstr} | {r:.2e} | "
                    f"{t_mc:.1f} s |\n")
        f.write("\n## Exact semi-infinite anchor (deterministic)\n\n")
        f.write("Plane albedo of a tau=64 isotropic atmosphere vs "
                "`1 - sqrt(1-w0) H(mu0)`:\n\n")
        f.write("| w0 | mu0 | solver | exact | rel err |\n|---|---|---|---|---|\n")
        for w0, mu0, got, want, rel in anchor:
            f.write(f"| {w0} | {mu0} | {got:.6f} | {want:.6f} | "
                    f"{rel:.2e} |\n")
    print(f"wrote {args.out} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
