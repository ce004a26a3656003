"""Benchmark: columns/s/chip at 8-stream x 100-layer DISORT.

The driver's north-star metric (BASELINE.md): batched discrete-ordinates
throughput on the correlated-k LW configuration (8 g-points, Planck thermal
sources, Lambertian surface, solar beam off) — the shape of the reference's
``amars_lw`` example scaled to production size (100 layers, many columns).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` denominator (the reference publishes no numbers, BASELINE.md)
is a MEASURED single-process CPU reference, 2026-08-21 on this machine:
this repo's own solver compiled by XLA:CPU at ncol=1 (same algorithm class
as cdisort, compiled code, no batching) ran 1.0 ms/step at the bench shape
= 1001 columns/s.  Cross-checks measured the same day: a numpy/LAPACK
re-timing of cdisort's algorithmic skeleton (per-layer reduced eigenproblem
+ 9-diagonal banded BC solve, Python-loop-bound) gave 149 (wave,col)
solves/s = 18.6 columns/s, and the repo's dense f64 oracle
(tests/oracle/dense_bvp.py, algorithmically heavier than cdisort) 0.34
columns/s.  We use the LARGEST of the three — the most conservative
denominator — so the quoted ratio is a floor.

A compiled cdisort timing remains unobtainable here (its C source is
fetched from an external repo at configure time and is absent from the
reference checkout; this environment has no network).  The compiled
third-party-class reference that DOES exist — the C Monte Carlo oracle
(csrc/mc_oracle.c, RMSE.md) — validates ACCURACY, not throughput: at
1e8 photons it spends ~15-250 s per single (wave, column) atmosphere,
so it is not a meaningful rate denominator for a deterministic solver.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_COLS_PER_S = 1001.0  # measured XLA:CPU ncol=1 reference (docstring)


def build_problem(ncol, nwave=8, nlyr=100, nstr=8, dtype=None):
    import jax.numpy as jnp

    from pyharp_tpu.rt import Disort, DisortOptions

    dtype = dtype or jnp.float32
    disort = Disort(DisortOptions(
        flags="lamber,quiet,onlyfl,planck",
        nwave=nwave, ncol=ncol, nlyr=nlyr, nstr=nstr, nmom=nstr,
        wave_lower=(1.0,) * nwave, wave_upper=(500.0,) * nwave))

    rng = np.random.default_rng(0)
    prop = np.zeros((nwave, ncol, nlyr, 2), np.float32)
    prop[..., 0] = rng.uniform(0.001, 0.8, (nwave, ncol, nlyr))
    prop[..., 1] = rng.uniform(0.0, 0.6, (nwave, ncol, nlyr))
    # thermal-only LW config: no fbeam key -> the solver statically skips the
    # beam particular solution (matching cdisort's fbeam == 0 fast path)
    bc = dict(
        umu0=np.full((nwave, ncol), 0.5, np.float32),
        albedo=np.full((nwave, ncol), 0.1, np.float32),
        btemp=np.full((nwave, ncol), 300.0, np.float32),
    )
    temf = np.linspace(200.0, 300.0, nlyr + 1, dtype=np.float32)
    temf = np.broadcast_to(temf, (ncol, nlyr + 1)).copy()
    weights = np.full((nwave,), 1.0 / nwave, np.float32)

    import jax

    prop = jnp.asarray(prop, dtype)
    bc = {k: jnp.asarray(v, dtype) for k, v in bc.items()}
    temf = jnp.asarray(temf, dtype)
    weights = jnp.asarray(weights, dtype)

    def step(prop, bc, temf):
        flux = disort.forward(prop, bc, temf)
        return jnp.einsum("g,g...->...", weights, flux)

    return jax.jit(step), (prop, bc, temf)


def main():
    import jax

    # persistent compile cache: the first compile of the full solver graph is
    # expensive on the remote TPU compiler; subsequent runs (including the
    # driver's) hit the cache
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    backend = jax.default_backend()
    # size the batch to the platform (HBM-fitting on one v5e chip)
    ncol = 8192 if backend != "cpu" else 128

    step, args = build_problem(ncol)
    out = jax.block_until_ready(step(*args))  # compile + warm
    assert np.all(np.isfinite(np.asarray(out[:8])))

    # timing fence: a device->host scalar read, not block_until_ready —
    # on the tunneled TPU platform the latter can resolve before device
    # execution completes for some programs (the read always drains the
    # queue; its one-off RTT is amortized over the iterations)
    n_iters = 10 if backend != "cpu" else 2
    float(step(*args)[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = step(*args)
    float(out[0, 0, 0])
    dt = (time.perf_counter() - t0) / n_iters

    cols_per_s = ncol / dt
    print(json.dumps({
        "metric": "columns_per_s_per_chip_8str_100lyr",
        "value": round(cols_per_s, 2),
        "unit": "columns/s/chip",
        "vs_baseline": round(cols_per_s / BASELINE_COLS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
