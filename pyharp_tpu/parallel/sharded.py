"""shard_map execution of the DISORT forward over a device mesh.

Two ways to scale the solver across chips:

1. **GSPMD** (``jit`` + ``NamedSharding`` inputs, see ``mesh.py``) — XLA
   partitions the whole graph automatically.  This is ideal for the pure-
   XLA solver path, but it cannot partition ``pallas_call`` (custom
   kernels have no SPMD partitioning rule), so on TPU it would gather the
   batch onto one device before the kernel.
2. **shard_map** (this module) — the mesh axes are mapped explicitly;
   every device traces the *local* program on its local shard, so the
   Pallas kernels run unmodified per-device, and the only cross-chip
   traffic is the explicit ``psum`` of the ck/band reduction over the
   ``wave`` axis (riding ICI).  This is the production TPU path; the
   communication pattern is the TPU-native replacement for the
   reference's MPI column exchanger (SURVEY.md section 5.8).

Planck band edges: a wave-sharded solve must see per-shard band edges, so
pass them as ``bc['wvnmlo'] / bc['wvnmhi']`` arrays of shape (nwave,)
(``Disort._band_edges`` prefers these over the static options tuples);
this helper does that automatically from the options when needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def _bc_specs(bc: dict) -> dict:
    """Per-key PartitionSpecs for the bc dict (scalars replicated)."""
    out = {}
    for k, v in bc.items():
        nd = getattr(v, "ndim", 0)
        if k in ("wvnmlo", "wvnmhi"):
            out[k] = P("wave")
        elif k == "radius":
            out[k] = P("wave", "col") if nd == 2 else P()
        elif k == "h_lev":
            out[k] = P("col", None)
        elif k == "gensrc":
            out[k] = P("wave", "col", None, None)
        elif nd == 2:
            out[k] = P("wave", "col")
        else:
            out[k] = P()
    return out


def _with_band_edges(disort, bc: dict, nwave: int) -> dict:
    """Materialize the static per-bin band edges as bc arrays."""
    if "wvnmlo" in bc or not disort.options.wave_lower:
        return bc
    bc = dict(bc)
    bc["wvnmlo"] = jnp.asarray(np.asarray(disort.options.wave_lower),
                               jnp.float32)
    bc["wvnmhi"] = jnp.asarray(np.asarray(disort.options.wave_upper),
                               jnp.float32)
    return bc


def sharded_forward(disort, mesh: Mesh, prop, bc: dict, temf=None):
    """``disort.forward`` over a ``('col', 'wave')`` mesh via shard_map.

    Args match :meth:`Disort.forward` with global shapes; the return is the
    global ``(nwave, ncol, nlyr+1, 2)`` flux (sharded (wave, col)).
    """
    bc = _with_band_edges(disort, bc, prop.shape[0])
    bspecs = _bc_specs(bc)
    in_specs = (P("wave", "col", None, None), bspecs,
                P("col", None) if temf is not None else P())
    out_specs = P("wave", "col", None, None)

    @jax.jit
    def run(prop, bc, temf):
        f = shard_map(
            lambda p, b, t: disort.forward(p, b, t if temf is not None
                                           else None),
            mesh=mesh, in_specs=in_specs, out_specs=out_specs)
        return f(prop, bc, temf)

    return run(prop, bc, temf if temf is not None
               else jnp.zeros((), jnp.float32))


def sharded_band_flux(disort, mesh: Mesh, prop, bc: dict, weights,
                      temf=None):
    """Forward + ck/spectral weighted reduction over the sharded wave axis.

    The reduction is a local einsum followed by one ``psum`` over the
    ``wave`` mesh axis — the only cross-chip collective in the steady
    state.  Returns the global band flux ``(ncol, nlyr+1, 2)`` (sharded on
    col, replicated over wave).
    """
    bc = _with_band_edges(disort, bc, prop.shape[0])
    bspecs = _bc_specs(bc)
    in_specs = (P("wave", "col", None, None), bspecs,
                P("col", None) if temf is not None else P(),
                P("wave"))
    out_specs = P("col", None, None)

    @jax.jit
    def run(prop, bc, temf, weights):
        def local(p, b, t, w):
            flux = disort.forward(p, b, t if temf is not None else None)
            bflx = jnp.einsum("g,g...->...", w, flux)
            return jax.lax.psum(bflx, "wave")

        f = shard_map(local, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs)
        return f(prop, bc, temf, weights)

    return run(prop, bc, temf if temf is not None
               else jnp.zeros((), jnp.float32), weights)
