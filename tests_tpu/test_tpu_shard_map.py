"""shard_map route on the real chip.

The production multi-chip path runs each device's LOCAL program — the
Pallas kernels — under shard_map with an explicit psum for the band
reduction.  Multi-chip hardware is unavailable here, but a 1x1 mesh on the
real TPU compiles and runs exactly that per-device program (Pallas inside
shard_map, Mosaic on hardware), which the CPU dryrun only ever sees in
interpret mode.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pyharp_tpu.parallel import make_radiation_mesh
from pyharp_tpu.parallel.sharded import sharded_band_flux, sharded_forward
from pyharp_tpu.rt import Disort, DisortOptions


def test_shard_map_pallas_on_chip():
    nwave, ncol, nlyr, nstr = 8, 256, 40, 8
    ds = Disort(DisortOptions(
        flags="lamber,quiet,onlyfl,planck",
        nwave=nwave, ncol=ncol, nlyr=nlyr, nstr=nstr, nmom=nstr,
        wave_lower=(1.0,) * nwave, wave_upper=(500.0,) * nwave))
    rng = np.random.default_rng(4)
    prop = np.zeros((nwave, ncol, nlyr, 2), np.float32)
    prop[..., 0] = rng.uniform(0.01, 0.8, (nwave, ncol, nlyr))
    prop[..., 1] = rng.uniform(0.0, 0.6, (nwave, ncol, nlyr))
    prop = jnp.asarray(prop)
    bc = dict(albedo=jnp.full((nwave, ncol), 0.1),
              btemp=jnp.full((nwave, ncol), 300.0))
    temf = jnp.asarray(np.broadcast_to(
        np.linspace(210.0, 290.0, nlyr + 1, dtype=np.float32),
        (ncol, nlyr + 1)).copy())
    weights = jnp.full((nwave,), 1.0 / nwave, jnp.float32)

    mesh = make_radiation_mesh(n_col=1, n_wave=1)
    direct = np.asarray(jax.jit(ds.forward)(prop, bc, temf))

    f_sm = np.asarray(sharded_forward(ds, mesh, prop, bc, temf))
    scale = np.abs(direct).max()
    np.testing.assert_allclose(f_sm, direct, atol=2e-5 * scale, rtol=2e-4)

    bflx = np.asarray(sharded_band_flux(ds, mesh, prop, bc, weights, temf))
    want = np.einsum("g,g...->...", np.asarray(weights), direct)
    np.testing.assert_allclose(bflx, want, atol=2e-5 * scale, rtol=2e-4)
