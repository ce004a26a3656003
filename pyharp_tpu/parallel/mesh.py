"""Device mesh + sharding for column/spectral parallelism.

TPU-native replacement for the reference's MPI column exchanger
(``/root/reference/src/radiation/radiation_band_exchanger.cpp_:18-96``,
legacy, behind ``#ifdef MPI_PARALLEL``).  The key simplification (SURVEY.md
section 5.8): plane-parallel columns are fully independent, so what MPI
gather did — assembling a full column per rank — disappears entirely.
Columns live whole on one chip; the mesh axes are pure data parallelism:

* ``col``  — the primary scaling axis (BASELINE config 5: 1e6 columns);
* ``wave`` — spectral/g-point axis, sharded when LBL grids exceed chip HBM.

With inputs placed via :func:`shard_band_inputs`, XLA propagates the
sharding through the whole band forward (opacity lookup, eigensolve, BVP
scan are all batch-local) and inserts exactly one collective: the ck/spectral
weighted reduction over ``wave`` — which rides ICI and overlaps with the
tail of compute.  No shard_map or manual collectives are required.

Multi-host: call :func:`init_distributed` first (jax.distributed), then
build the mesh over all devices; per-host ingestion loads only the host's
column shard via ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host initialization (no-op on a single process)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_radiation_mesh(n_col: int | None = None, n_wave: int = 1,
                        devices=None) -> Mesh:
    """Mesh with axes ``('col', 'wave')``.

    Defaults to all devices on the column axis (the embarrassing axis).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_col is None:
        n_col = devices.size // n_wave
    if n_col * n_wave != devices.size:
        raise ValueError(
            f"mesh {n_col}x{n_wave} != {devices.size} devices")
    return Mesh(devices.reshape(n_col, n_wave), ("col", "wave"))


def band_input_specs():
    """PartitionSpecs for the band forward signature.

    Returns a dict: conc (ncol,nlyr,nspecies) sharded on col; dz replicated;
    bc tensors (nwave,ncol) sharded on both axes; atm fields (ncol,nlyr)
    sharded on col; prop (nwave,ncol,nlyr,nprop) on (wave, col).
    """
    return dict(
        conc=P("col", None, None),
        dz=P(),
        bc=P("wave", "col"),
        atm=P("col", None),
        prop=P("wave", "col", None, None),
        flux=P("wave", "col", None, None),
        wave=P("wave"),
    )


def shard_band_inputs(mesh: Mesh, conc, dz, bc: dict, atm: dict | None = None):
    """Place band inputs with NamedShardings on the mesh."""
    specs = band_input_specs()

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    conc = put(conc, specs["conc"])
    dz = put(dz, specs["dz"])
    bc = {k: put(v, specs["bc"]) for k, v in bc.items()}
    if atm is not None:
        atm = {
            k: put(v, specs["wave"] if getattr(v, "ndim", 0) == 1
                   else specs["atm"])
            for k, v in atm.items()
        }
        return conc, dz, bc, atm
    return conc, dz, bc
