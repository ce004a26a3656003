"""Device-mesh / sharding helpers (columns x spectral data parallelism).

TPU-native replacement for the reference's legacy MPI column exchanger
(``src/radiation/radiation_band_exchanger.cpp_``) — see SURVEY.md section 5.8:
columns live whole on one chip, the mesh axes are purely data-parallel, and
the only steady-state cross-chip traffic is the band/diagnostic reduction.
"""

from .mesh import (
    init_distributed,
    make_radiation_mesh,
    band_input_specs,
    shard_band_inputs,
)
from .sharded import sharded_forward, sharded_band_flux

__all__ = [
    "init_distributed", "make_radiation_mesh", "band_input_specs",
    "shard_band_inputs", "sharded_forward", "sharded_band_flux",
]
