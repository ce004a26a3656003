"""Multi-device sharding: correctness of the pjit'd solve on a virtual mesh.

The reference's distributed story is a legacy MPI column exchanger with no
tests (``/root/reference/src/radiation/radiation_band_exchanger.cpp_``,
SURVEY.md sections 2.4/5.8); here columns/waves are pure data-parallel mesh
axes and we assert (a) the sharded solve runs on an actual 8-device mesh,
(b) it produces the same numbers as the single-device solve, and (c) outputs
carry the requested shardings.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pyharp_tpu.parallel import make_radiation_mesh, shard_band_inputs
from pyharp_tpu.rt import Disort, DisortOptions

_ENOUGH = len(jax.devices()) >= 8
_CAN_SUB = (os.environ.get("PALLAS_AXON_POOL_IPS")
            and not os.environ.get("_PYHARP_SUBTEST"))

if not _ENOUGH and _CAN_SUB:
    # The axon sitecustomize initialized jax at interpreter startup with one
    # CPU device; virtual-device flags can't take effect in-process.  Re-run
    # this module in a clean subprocess where they can.
    def test_parallel_suite_in_clean_subprocess():
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["_PYHARP_SUBTEST"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        r = subprocess.run(
            [sys.executable, "-m", "pytest", os.path.abspath(__file__), "-q"],
            env=env, capture_output=True, text=True, timeout=1200,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        sys.stdout.write(r.stdout[-4000:])
        assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-2000:]

needs_mesh = pytest.mark.skipif(
    not _ENOUGH, reason="needs 8 (virtual) devices; covered by the clean "
    "subprocess wrapper when running under the axon environment")


def _problem(nwave=4, ncol=8, nlyr=10, nstr=8):
    ds = Disort(DisortOptions(
        flags="lamber,quiet,onlyfl,planck",
        nwave=nwave, ncol=ncol, nlyr=nlyr, nstr=nstr, nmom=nstr,
        wave_lower=(1.0,) * nwave, wave_upper=(150.0,) * nwave))
    rng = np.random.default_rng(3)
    prop = np.zeros((nwave, ncol, nlyr, 3), np.float64)
    prop[..., 0] = rng.uniform(0.01, 0.5, (nwave, ncol, nlyr))
    prop[..., 1] = rng.uniform(0.1, 0.9, (nwave, ncol, nlyr))
    prop[..., 2] = 0.15
    bc = dict(
        fbeam=np.full((nwave, ncol), np.pi),
        umu0=np.full((nwave, ncol), 0.8),
        albedo=np.full((nwave, ncol), 0.3),
        btemp=np.full((nwave, ncol), 300.0),
    )
    temf = np.broadcast_to(np.linspace(220.0, 290.0, nlyr + 1),
                           (ncol, nlyr + 1)).copy()
    return ds, jnp.asarray(prop), {k: jnp.asarray(v) for k, v in bc.items()}, \
        jnp.asarray(temf)


@needs_mesh
def test_sharded_matches_single_device():
    ds, prop, bc, temf = _problem()
    expect = np.asarray(ds.forward(prop, bc, temf))

    mesh = make_radiation_mesh(n_col=4, n_wave=2)
    sh_prop = NamedSharding(mesh, P("wave", "col", None, None))
    sh_bc = NamedSharding(mesh, P("wave", "col"))
    prop_s = jax.device_put(prop, sh_prop)
    bc_s = {k: jax.device_put(v, sh_bc) for k, v in bc.items()}
    temf_s = jax.device_put(temf, NamedSharding(mesh, P("col", None)))

    out_sh = NamedSharding(mesh, P("wave", "col", None, None))
    fwd = jax.jit(ds.forward, out_shardings=out_sh)
    with mesh:
        got = fwd(prop_s, bc_s, temf_s)

    assert got.sharding.is_equivalent_to(out_sh, got.ndim)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-12, atol=1e-14)


@needs_mesh
def test_ck_reduction_collective_over_wave():
    ds, prop, bc, temf = _problem()
    w = jnp.full((prop.shape[0],), 1.0 / prop.shape[0], prop.dtype)
    expect = np.asarray(
        jnp.einsum("g,g...->...", w, ds.forward(prop, bc, temf)))

    mesh = make_radiation_mesh(n_col=2, n_wave=4)
    prop_s = jax.device_put(prop, NamedSharding(mesh, P("wave", "col")))
    bc_s = {k: jax.device_put(v, NamedSharding(mesh, P("wave", "col")))
            for k, v in bc.items()}
    temf_s = jax.device_put(temf, NamedSharding(mesh, P("col", None)))
    w_s = jax.device_put(w, NamedSharding(mesh, P("wave")))

    def step(prop, bc, temf, w):
        return jnp.einsum("g,g...->...", w, ds.forward(prop, bc, temf))

    out_sh = NamedSharding(mesh, P("col", None, None))
    with mesh:
        got = jax.jit(step, out_shardings=out_sh)(prop_s, bc_s, temf_s, w_s)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-12, atol=1e-14)


@needs_mesh
def test_shard_map_forward_matches_single_device():
    """The explicit shard_map path (production TPU route for the Pallas
    kernels, which GSPMD cannot partition) must agree with the plain
    single-device forward, including wave-sharded Planck band edges."""
    from pyharp_tpu.parallel import sharded_forward, sharded_band_flux

    ds, prop, bc, temf = _problem()
    expect = np.asarray(ds.forward(prop, bc, temf))

    mesh = make_radiation_mesh(n_col=4, n_wave=2)
    got = sharded_forward(ds, mesh, prop, bc, temf)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-12,
                               atol=1e-14)

    w = jnp.full((prop.shape[0],), 1.0 / prop.shape[0], prop.dtype)
    want = np.asarray(jnp.einsum("g,g...->...", w, jnp.asarray(expect)))
    got2 = sharded_band_flux(ds, mesh, prop, bc, w, temf)
    np.testing.assert_allclose(np.asarray(got2), want, rtol=1e-12,
                               atol=1e-14)


@needs_mesh
def test_shard_band_inputs_helper():
    mesh = make_radiation_mesh(n_col=8, n_wave=1)
    conc = jnp.ones((8, 10, 2))
    dz = jnp.ones((8, 10))
    bc = dict(fbeam=jnp.ones((4, 8)))
    conc_s, dz_s, bc_s = shard_band_inputs(mesh, conc, dz, bc)
    assert conc_s.sharding.is_equivalent_to(
        NamedSharding(mesh, P("col", None, None)), conc_s.ndim)
    assert bc_s["fbeam"].sharding.is_equivalent_to(
        NamedSharding(mesh, P("wave", "col")), 2)


@needs_mesh
def test_sharded_array_io_roundtrip(tmp_path):
    """Per-host sharded writes reassemble to the global array (SURVEY 5.8:
    the PNetCDF-replacement output path); replicated axes write once."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pyharp_tpu.parallel import make_radiation_mesh
    from pyharp_tpu.utils.checkpoint import (load_array_sharded,
                                             save_array_sharded)

    ndev = len(jax.devices())
    mesh = make_radiation_mesh(n_col=ndev, n_wave=1)
    x = jnp.arange(ndev * 4 * 3, dtype=jnp.float64).reshape(ndev * 4, 3)
    xs = jax.device_put(x, NamedSharding(mesh, P("col", None)))

    prefix = str(tmp_path / "flux")
    paths = save_array_sharded(prefix, xs)
    assert len(paths) == ndev + 1          # one file per shard + index
    back = load_array_sharded(prefix)
    np.testing.assert_array_equal(back, np.asarray(x))

    # replicated array: a single shard file, still exact
    xr = jax.device_put(x, NamedSharding(mesh, P()))
    prefix2 = str(tmp_path / "rep")
    paths2 = save_array_sharded(prefix2, xr)
    assert len(paths2) == 2
    np.testing.assert_array_equal(load_array_sharded(prefix2), np.asarray(x))

    # plain numpy degrades to .npy
    prefix3 = str(tmp_path / "plain")
    save_array_sharded(prefix3, np.asarray(x))
    np.testing.assert_array_equal(load_array_sharded(prefix3), np.asarray(x))
