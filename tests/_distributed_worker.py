"""Worker for the 2-process jax.distributed smoke test.

Launched by tests/test_distributed.py as:

    python tests/_distributed_worker.py <coordinator> <nproc> <pid>

Each process owns 2 virtual CPU devices (4 global), initializes
jax.distributed through ``pyharp_tpu.parallel.init_distributed``, builds the
('col', 'wave') mesh over the GLOBAL device set, assembles its process-local
column shard with ``jax.make_array_from_process_local_data``, and runs the
jitted DISORT forward sharded over columns.  Process 0 prints a checksum of
the fully-replicated band flux; the parent asserts both processes agree with
the single-process reference.
"""

import sys

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pyharp_tpu.parallel import init_distributed, make_radiation_mesh
from pyharp_tpu.rt import Disort, DisortOptions


def problem(nwave=2, ncol=8, nlyr=4, nstr=4):
    ds = Disort(DisortOptions(
        flags="lamber,quiet,onlyfl,planck",
        nwave=nwave, ncol=ncol, nlyr=nlyr, nstr=nstr, nmom=nstr,
        wave_lower=(1.0,) * nwave, wave_upper=(150.0,) * nwave))
    rng = np.random.default_rng(11)
    prop = np.zeros((nwave, ncol, nlyr, 2), np.float64)
    prop[..., 0] = rng.uniform(0.01, 0.5, (nwave, ncol, nlyr))
    prop[..., 1] = rng.uniform(0.1, 0.8, (nwave, ncol, nlyr))
    bc = dict(albedo=np.full((nwave, ncol), 0.2),
              btemp=np.full((nwave, ncol), 280.0))
    temf = np.broadcast_to(np.linspace(210.0, 270.0, nlyr + 1),
                           (ncol, nlyr + 1)).copy()
    return ds, prop, bc, temf


def main():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    init_distributed(coordinator=coord, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    ndev = len(jax.devices())
    assert ndev == nproc * len(jax.local_devices()), (
        ndev, len(jax.local_devices()))

    ds, prop, bc, temf = problem()
    nwave, ncol = prop.shape[0], prop.shape[1]
    mesh = make_radiation_mesh(n_col=ndev, n_wave=1)
    sh4 = NamedSharding(mesh, P(None, "col", None, None))
    sh2 = NamedSharding(mesh, P(None, "col"))
    shl = NamedSharding(mesh, P("col", None))

    # per-process ingestion: each host materializes ONLY its column shard
    # (the pattern SURVEY 5.8 prescribes in place of the MPI exchanger)
    prop_g = jax.make_array_from_process_local_data(
        sh4, prop[:, pid * (ncol // nproc):(pid + 1) * (ncol // nproc)])
    bc_g = {k: jax.make_array_from_process_local_data(
        sh2, v[:, pid * (ncol // nproc):(pid + 1) * (ncol // nproc)])
        for k, v in bc.items()}
    temf_g = jax.make_array_from_process_local_data(
        shl, temf[pid * (ncol // nproc):(pid + 1) * (ncol // nproc)])

    @jax.jit
    def step(prop, bc, temf):
        flux = ds.forward(prop, bc, temf)
        # a scalar diagnostic that forces a cross-process collective (the
        # only steady-state communication in the design) + the column-
        # sharded flux field itself
        return flux.mean(), flux

    out, flux = step(prop_g, bc_g, temf_g)
    out = float(out)
    print(f"proc {pid}: checksum {out:.12e}", flush=True)

    # per-host parallel output (SURVEY 5.8): every process writes ONLY its
    # addressable shards; the parent reassembles and checks the global
    # array (the role PNetCDF played for the reference)
    if len(sys.argv) > 4:
        from pyharp_tpu.utils.checkpoint import save_array_sharded

        save_array_sharded(sys.argv[4], flux)
        print(f"proc {pid}: shards written", flush=True)


if __name__ == "__main__":
    main()
