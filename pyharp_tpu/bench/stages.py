"""Stage-level microbenchmarks of the DISORT core on the current backend.

Times each pipeline stage (homogeneous eigensolve, thermal particular,
BVP scan, flux assembly, full forward) at the north-star problem size so
optimization work targets the real bottleneck.  Run:

    python -m pyharp_tpu.bench.stages [ncol]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _force(out):
    """Fetch one scalar from the first array leaf.

    On the tunneled TPU platform ``jax.block_until_ready`` can return
    before execution completes for some programs; a device->host scalar
    read always forces the queue.
    """
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.reshape(-1)[0])


def timeit(fn, args, iters=10):
    _force(fn(*args))  # compile
    _force(fn(*args))  # warm + drain
    t0 = time.perf_counter()
    for _ in range(iters):
        _force(fn(*args))
    return (time.perf_counter() - t0) / iters


def main(ncol=8192, nwave=8, nlyr=100, nstr=8):
    import jax
    import jax.numpy as jnp

    from pyharp_tpu.rt.disort import solver as S

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    dtype = jnp.float32
    N = nstr // 2
    L, B = nlyr, nwave * ncol
    ang = S.make_static_angles(nstr, nstr, 0)

    rng = np.random.default_rng(0)
    ssa = jnp.asarray(rng.uniform(0.0, 0.6, (L, B)), dtype)
    pmom = jnp.asarray(rng.uniform(0.0, 0.3, (L, nstr, B)), dtype)
    dtau = jnp.asarray(rng.uniform(0.001, 0.8, (L, B)), dtype)
    btop = jnp.asarray(rng.uniform(0.0, 1.0, (L, B)), dtype)
    slope = jnp.asarray(rng.uniform(-0.1, 0.1, (L, B)), dtype)
    albedo = jnp.full((B,), 0.1, dtype)
    ftop = jnp.zeros((N, B), dtype)
    bot_rhs = jnp.asarray(rng.uniform(0.0, 1.0, (N, B)), dtype)

    homo = jax.jit(lambda s, p, d: S.homogeneous_solution(s, p, d, ang))
    t_homo = timeit(homo, (ssa, pmom, dtau))

    def thermal(s, p, d, bt, sl):
        sol, V, U = S.homogeneous_solution(s, p, d, ang)
        return S.thermal_particular(V, U, s, bt, sl, ang)

    t_thermal = timeit(jax.jit(thermal), (ssa, pmom, dtau, btop, slope))

    def full(s, p, d, bt, sl, alb, ft, br):
        sol, V, U = S.homogeneous_solution(s, p, d, ang)
        y0p, y0m, y1 = S.thermal_particular(V, U, s, bt, sl, ang)
        ptop_p, ptop_m = y0p, y0m
        pbot_p = y0p + y1 * d[None]
        pbot_m = y0m + y1 * d[None]
        return S.solve_bvp(sol, ptop_p, ptop_m, pbot_p, pbot_m, ft, br,
                           alb, ang)

    t_full = timeit(jax.jit(full),
                    (ssa, pmom, dtau, btop, slope, albedo, ftop, bot_rhs))

    print(f"backend             : {jax.default_backend()}")
    print(f"problem             : nstr={nstr} L={L} B={B} "
          f"({nwave} waves x {ncol} cols)")
    print(f"homogeneous (eigen) : {t_homo*1e3:8.2f} ms")
    print(f"  + thermal part.   : {t_thermal*1e3:8.2f} ms "
          f"(delta {(t_thermal-t_homo)*1e3:+.2f})")
    print(f"  + BVP scan        : {t_full*1e3:8.2f} ms "
          f"(delta {(t_full-t_thermal)*1e3:+.2f})")
    cols = ncol / t_full
    print(f"solver-only rate    : {cols:,.0f} columns/s")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
