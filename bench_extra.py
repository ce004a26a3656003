"""Extra benchmark configurations from BASELINE.md's config table.

bench.py measures the headline config (2: correlated-k LW, 8-stream Planck).
This script measures the remaining single-chip configurations and writes
BENCH_EXTRA.json:

  1. amars_sw-style LBL shortwave: 4-stream, solar beam, aerosol scattering,
     500-wave LBL grid x 40 layers (the reference SW example's shape,
     batched over columns);
  4. 16-stream aerosol (s8+h2so4-like optics, HG moments), beam;
  5. production-scale column sweep: 8-stream x 100-layer thermal LW at the
     largest HBM-fitting batch, reported as columns/s and extrapolated
     wall-time for 1e6 columns x 100 layers on ONE chip (the multi-host
     version of config 5 shards this embarrassing axis; see SCALING.json
     for the mesh-scaling efficiency).

Run on the TPU:  PYTHONPATH=/root/repo:/root/.axon_site python bench_extra.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def _force(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(leaf.reshape(-1)[0])


def measure(step, args, iters):
    _force(step(*args))   # compile + warm
    _force(step(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = step(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


def build(nwave, ncol, nlyr, nstr, *, beam, planck, g=0.0, seed=0):
    import jax
    import jax.numpy as jnp

    from pyharp_tpu.rt import Disort, DisortOptions

    dtype = jnp.float32
    flags = "lamber,quiet,onlyfl" + (",planck" if planck else "")
    nmom = nstr if g else 0
    ds = Disort(DisortOptions(
        flags=flags, nwave=nwave, ncol=ncol, nlyr=nlyr, nstr=nstr,
        nmom=max(nmom, nstr),
        wave_lower=(1.0,) * nwave if planck else (),
        wave_upper=(500.0,) * nwave if planck else ()))
    rng = np.random.default_rng(seed)
    prop = np.zeros((nwave, ncol, nlyr, 2 + nmom), np.float32)
    prop[..., 0] = rng.uniform(0.001, 0.8, (nwave, ncol, nlyr))
    prop[..., 1] = rng.uniform(0.1, 0.95, (nwave, ncol, nlyr))
    if nmom:
        prop[..., 2:] = g ** np.arange(1, nmom + 1)
    bc = dict(albedo=jnp.full((nwave, ncol), 0.3, dtype))
    temf = None
    if beam:
        bc["fbeam"] = jnp.full((nwave, ncol), float(np.pi), dtype)
        bc["umu0"] = jnp.full((nwave, ncol), 0.7, dtype)
    if planck:
        bc["btemp"] = jnp.full((nwave, ncol), 300.0, dtype)
        temf = jnp.asarray(np.broadcast_to(
            np.linspace(200.0, 300.0, nlyr + 1, dtype=np.float32),
            (ncol, nlyr + 1)).copy())

    prop = jnp.asarray(prop)

    def step(prop, bc, temf):
        flux = ds.forward(prop, bc, temf)
        return flux.mean(axis=0)

    return jax.jit(step), (prop, bc, temf)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    on_tpu = jax.default_backend() != "cpu"
    iters = 10 if on_tpu else 2
    scale = 1 if on_tpu else 16   # shrink batches for a CPU smoke run

    results = []

    # config 1: SW LBL 4-stream with beam (amars_sw shape, batched columns)
    ncol = 512 // scale
    step, args = build(500, ncol, 40, 4, beam=True, planck=False)
    sec = measure(step, args, iters)
    results.append({
        "config": "sw_lbl_4str_beam",
        "shape": {"nwave": 500, "ncol": ncol, "nlyr": 40, "nstr": 4},
        "seconds": round(sec, 6),
        "columns_per_s": round(ncol / sec, 2),
        "wavecol_solves_per_s": round(500 * ncol / sec, 1),
    })

    # config 4: 16-stream aerosol scattering (HG moments), beam
    ncol = 128 // scale
    step, args = build(500, ncol, 40, 16, beam=True, planck=False, g=0.8)
    sec = measure(step, args, iters)
    results.append({
        "config": "aerosol_16str_beam",
        "shape": {"nwave": 500, "ncol": ncol, "nlyr": 40, "nstr": 16},
        "seconds": round(sec, 6),
        "columns_per_s": round(ncol / sec, 2),
        "wavecol_solves_per_s": round(500 * ncol / sec, 1),
    })

    # config 5 (single-chip slice): 8-stream x 100-layer thermal LW at the
    # largest fitting batch; extrapolate 1e6 columns
    ncol = 16384 // scale
    step, args = build(8, ncol, 100, 8, beam=False, planck=True)
    sec = measure(step, args, iters)
    cols_per_s = ncol / sec
    results.append({
        "config": "thermal_lw_8str_100lyr_bigbatch",
        "shape": {"nwave": 8, "ncol": ncol, "nlyr": 100, "nstr": 8},
        "seconds": round(sec, 6),
        "columns_per_s": round(cols_per_s, 2),
        "seconds_for_1e6_columns_one_chip": round(1e6 / cols_per_s, 3),
    })

    # radiance config (VERDICT r5: the intensities path gets a perf
    # number): nstr=8, 4 user angles x 2 azimuths x 3 user taus, beam +
    # HG scattering, compile time recorded alongside throughput (the
    # mode-batched m>=1 pipeline is what keeps it tractable)
    import jax.numpy as jnp

    from pyharp_tpu.rt import Disort, DisortOptions

    ncol, nwave, nlyr, nstr = 512 // scale, 32, 40, 8
    ds = Disort(DisortOptions(
        flags="lamber,quiet,usrang,usrtau,intensity_correction",
        nwave=nwave, ncol=ncol, nlyr=nlyr, nstr=nstr, nmom=nstr,
        user_mu=(-0.8, -0.4, 0.4, 0.8), user_phi=(0.0, np.pi / 2),
        user_tau=(0.5, 2.0, 5.0)))
    rng = np.random.default_rng(0)
    prop = np.zeros((nwave, ncol, nlyr, 2 + nstr), np.float32)
    prop[..., 0] = rng.uniform(0.01, 0.5, (nwave, ncol, nlyr))
    prop[..., 1] = rng.uniform(0.1, 0.9, (nwave, ncol, nlyr))
    prop[..., 2:] = 0.7 ** np.arange(1, nstr + 1)
    bc = dict(albedo=jnp.full((nwave, ncol), 0.2),
              fbeam=jnp.full((nwave, ncol), float(np.pi)),
              umu0=jnp.full((nwave, ncol), 0.7))
    rad_step = jax.jit(lambda p, b: ds.intensities(p, b)["uu"])
    t0 = time.perf_counter()
    _force(rad_step(jnp.asarray(prop), bc))
    compile_s = time.perf_counter() - t0
    sec = measure(rad_step, (jnp.asarray(prop), bc), iters)
    results.append({
        "config": "radiances_8str_4mu_2phi_3tau",
        "shape": {"nwave": nwave, "ncol": ncol, "nlyr": nlyr,
                  "nstr": nstr, "numu": 4, "nphi": 2, "ntau": 3},
        "seconds": round(sec, 6),
        "columns_per_s": round(ncol / sec, 2),
        "radiances_per_s": round(nwave * ncol * 4 * 2 * 3 / sec, 1),
        "compile_s_incl_cache": round(compile_s, 1),
    })

    out = {"device": jax.devices()[0].device_kind, "results": results}
    print(json.dumps(out, indent=1))
    if on_tpu:
        with open("BENCH_EXTRA.json", "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
