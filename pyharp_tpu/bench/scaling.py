"""Multi-device scaling harness.

Measures columns/s at 1..N devices on a ``('col', 'wave')`` mesh with real
NamedShardings — the BASELINE acceptance is >= 80% scaling efficiency from
one chip to a multi-host slice.  On a single-chip environment this runs on
virtual CPU devices (``XLA_FLAGS=--xla_force_host_platform_device_count=N``),
which validates the sharded program and measures the sharding/collective
overhead the real slice would amortize over ICI.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.mesh import make_radiation_mesh
from ..rt import Disort, DisortOptions
from .profile import measure


def build_sharded_step(mesh, nwave, ncol, nlyr=100, nstr=8,
                       dtype=jnp.float32):
    disort = Disort(DisortOptions(
        flags="lamber,quiet,onlyfl,planck",
        nwave=nwave, ncol=ncol, nlyr=nlyr, nstr=nstr, nmom=nstr,
        wave_lower=(1.0,) * nwave, wave_upper=(500.0,) * nwave))

    rng = np.random.default_rng(0)
    prop = np.zeros((nwave, ncol, nlyr, 2), np.float32)
    prop[..., 0] = rng.uniform(0.001, 0.8, (nwave, ncol, nlyr))
    prop[..., 1] = rng.uniform(0.0, 0.6, (nwave, ncol, nlyr))
    bc = dict(
        fbeam=np.zeros((nwave, ncol), np.float32),
        umu0=np.full((nwave, ncol), 0.5, np.float32),
        albedo=np.full((nwave, ncol), 0.1, np.float32),
        btemp=np.full((nwave, ncol), 300.0, np.float32),
    )
    temf = np.broadcast_to(
        np.linspace(200.0, 300.0, nlyr + 1, dtype=np.float32),
        (ncol, nlyr + 1)).copy()
    weights = np.full((nwave,), 1.0 / nwave, np.float32)

    sh_prop = NamedSharding(mesh, P("wave", "col", None, None))
    sh_bc = NamedSharding(mesh, P("wave", "col"))
    prop = jax.device_put(jnp.asarray(prop, dtype), sh_prop)
    bc = {k: jax.device_put(jnp.asarray(v, dtype), sh_bc)
          for k, v in bc.items()}
    temf = jax.device_put(jnp.asarray(temf, dtype),
                          NamedSharding(mesh, P("col", None)))
    weights = jax.device_put(jnp.asarray(weights, dtype),
                             NamedSharding(mesh, P("wave")))

    def step(prop, bc, temf, weights):
        flux = disort.forward(prop, bc, temf)
        return jnp.einsum("g,g...->...", weights, flux)

    return jax.jit(step), (prop, bc, temf, weights)


def scaling_run(cols_per_device: int = 256, nwave: int = 8, nlyr: int = 100,
                nstr: int = 8, device_counts=None) -> list[dict]:
    """Weak-scaling sweep; returns one record per device count.

    Only meaningful when each mesh device is a REAL chip.  On virtual CPU
    devices (forced host device count) the devices oversubscribe the same
    cores, so per-device throughput falls as ~1/n^2 and the efficiency
    column measures oversubscription, not the sharded program — use
    :func:`partition_overhead_run` there instead.
    """
    ndev = len(jax.devices())
    if device_counts is None:
        device_counts = (1, 2, 4, 8, 16, 32)
    device_counts = [n for n in device_counts if n <= ndev]
    results = []
    base = None
    for n in device_counts:
        mesh = make_radiation_mesh(n_col=n, n_wave=1,
                                   devices=jax.devices()[:n])
        ncol = cols_per_device * n
        step, args = build_sharded_step(mesh, nwave, ncol, nlyr, nstr)
        with mesh:
            sec = measure(step, *args, iters=3)
        cols_per_s = ncol / sec
        if base is None:
            base = cols_per_s / n
        results.append({
            "devices": n,
            "columns_per_s": round(cols_per_s, 2),
            "columns_per_s_per_device": round(cols_per_s / n, 2),
            "efficiency": round(cols_per_s / (base * n), 4),
        })
    return results


def partition_overhead_run(ncol_total: int = 1024, nwave: int = 8,
                           nlyr: int = 100, nstr: int = 8) -> dict:
    """Fixed-global-work comparison: 1 device vs the full virtual mesh.

    On a single host whose virtual devices share the same cores, total
    work is constant, so ``t_sharded / t_single ~ 1`` iff partitioning the
    program (GSPMD sharding, per-device dispatch, the wave-axis reduction)
    adds no redundant compute or data movement.  This is the honest
    single-host proxy for multi-chip scaling efficiency; the real-slice
    ingredient it cannot see — ICI latency — is bounded separately by the
    communication model below (one (nlyr+1) x 2 psum per band per step).
    """
    ndev = len(jax.devices())
    mesh1 = make_radiation_mesh(n_col=1, n_wave=1, devices=jax.devices()[:1])
    step1, args1 = build_sharded_step(mesh1, nwave, ncol_total, nlyr, nstr)
    with mesh1:
        t1 = measure(step1, *args1, iters=3)

    # one device solving exactly one shard's worth of columns — the unit of
    # work each mesh device runs.  Virtual CPU devices execute serially on
    # the same cores, so the no-overhead expectation for the sharded run is
    # ndev * t_shard (serialized), NOT t_single / ndev.
    stepS, argsS = build_sharded_step(mesh1, nwave, ncol_total // ndev,
                                      nlyr, nstr)
    with mesh1:
        t_shard = measure(stepS, *argsS, iters=3)

    meshN = make_radiation_mesh(n_col=ndev, n_wave=1)
    stepN, argsN = build_sharded_step(meshN, nwave, ncol_total, nlyr, nstr)
    with meshN:
        tN = measure(stepN, *argsN, iters=3)

    # steady-state cross-device traffic: the band flux reduction over the
    # 'wave' mesh axis (none here: wave axis is local) and the final
    # replicated output gather: (nlyr+1) levels x 2 components x f32
    psum_bytes = (nlyr + 1) * 2 * 4
    return {
        "devices": ndev,
        "ncol_total": ncol_total,
        "t_single_s": round(t1, 4),
        "t_one_shard_s": round(t_shard, 4),
        "t_sharded_s": round(tN, 4),
        # ~1 => partitioning added no redundant work beyond running each
        # shard; the gap between ndev*t_shard and t_single is the (CPU)
        # small-batch efficiency loss, not a property of the sharding
        "overhead_vs_serialized_shards": round(tN / (ndev * t_shard), 4),
        "partition_overhead_vs_single": round(tN / t1, 4),
        "steady_state_psum_bytes_per_column": psum_bytes,
    }


def main():
    import sys

    ncol = 1024
    if len(sys.argv) > 1:
        ncol = int(sys.argv[1])
    print(json.dumps(partition_overhead_run(ncol_total=ncol)))


if __name__ == "__main__":
    main()
