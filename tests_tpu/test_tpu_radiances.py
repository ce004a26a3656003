"""On-chip radiance (intensities) path.

The flux solve is covered by the kernel-agreement tests; this compiles and
runs the full azimuthal-mode radiance machinery (source-function sweeps,
TMS/IMS corrections, user taus) on the hardware — the XLA+Pallas mixed
path the CPU tier only ever sees in interpret mode.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pyharp_tpu.rt import Disort, DisortOptions


def test_intensities_compile_and_sanity_on_chip():
    nwave, ncol, nlyr, nstr = 4, 16, 20, 8
    rng = np.random.default_rng(2)
    nmom = nstr
    prop = np.zeros((nwave, ncol, nlyr, 2 + nmom), np.float32)
    prop[..., 0] = rng.uniform(0.01, 0.6, (nwave, ncol, nlyr))
    prop[..., 1] = rng.uniform(0.2, 0.9, (nwave, ncol, nlyr))
    prop[..., 2:] = 0.7 ** np.arange(1, nmom + 1)
    prop = jnp.asarray(prop)
    bc = dict(fbeam=jnp.full((nwave, ncol), float(np.pi)),
              umu0=jnp.full((nwave, ncol), 0.6),
              albedo=jnp.full((nwave, ncol), 0.2))

    ds = Disort(DisortOptions(
        flags="lamber,quiet,usrang,usrtau,intensity_correction",
        nwave=nwave, ncol=ncol, nlyr=nlyr, nstr=nstr, nmom=nmom,
        user_mu=(0.5, -0.5, 0.9), user_phi=(0.0, np.pi / 2),
        user_tau=(0.0, 1.0, 3.0)))
    out = jax.jit(ds.intensities)(prop, bc, None)
    uu = np.asarray(out["uu"])
    assert uu.shape == (nwave, ncol, 3, 2, 3)
    assert np.all(np.isfinite(uu))
    # physical sanity: upwelling TOA radiance positive under a scattered
    # beam with a reflecting surface
    assert np.all(uu[:, :, 0, :, 0] > 0)      # mu = +0.5 at tau = 0
    assert np.all(uu[:, :, 0, :, 2] > 0)      # mu = +0.9 at tau = 0

    # flux consistency with forward() on the chip
    flux = np.asarray(jax.jit(ds.forward)(prop, bc))
    np.testing.assert_allclose(np.asarray(out["flux"]), flux,
                               rtol=2e-4, atol=1e-5 * np.abs(flux).max())
