"""Roofline analysis of the two Pallas TPU kernels (BASELINE north star:
"kernel speed-of-light roofline analysis per chip").

Calls ``fused_homogeneous_thermal`` and ``solve_bvp_pallas`` directly at the
bench shape and places each on the chip roofline with analytic FLOP/byte
counts derived below.  Writes markdown to stdout (captured into ROOFLINE.md).

FLOP/byte accounting (per (layer, batch-column) element, N = nstr/2):

``fused_homogeneous_thermal`` — phase-moment contraction into the reduced
N x N operators (~2 * nmom * N^2 madds), symmetrized product + Cholesky
(~3 N^3), ``sweeps`` cyclic-Jacobi sweeps of N(N-1)/2 rotations each
updating two rows/columns of the matrix and eigenvector accumulator
(~12 N per rotation), eigenvector back-transform (2 N^3), thermal
particular solves (~8 N^2), exponentials (N).  Traffic: reads
(4 + nmom) f32 per element (ssa, dtau, b_top, slope, pmom), writes
2 N^2 + 5 N f32 (gp, gm, lam, expd, y0p, y0m, y1).

``solve_bvp_pallas`` — block-tridiagonal (Thomas) factor+solve with
2N x 2N blocks built in-kernel from the eigen solution: block LU
(~2/3 (2N)^3), two triangular solves + the off-diagonal update
(~3 (2N)^2 each fwd+bwd).  Traffic (both passes): forward reads gp/gm/E/
rhs (2 N^2 + N + 2 N) and writes the propagation carry P, g (2 N^2 + 2 N);
backward re-reads gp/gm/E plus P, g and writes a, b (2 N) — the P/g
round-trip through HBM between the sweeps is the dominant term and is
counted here (~168 f32 per (layer, column) at N = 4).

Both kernels sit far below the MXU flop roof by construction (tiny-N
batched linear algebra is VPU work), so the relevant ceiling is HBM
bandwidth — the bw_frac column is the speed-of-light measure.
"""

from __future__ import annotations

import json
import sys

import numpy as np


def kernel_counts(L, B, N, nmom, sweeps):
    f32 = 4
    fused_flops = L * B * (
        2 * nmom * N * N + 3 * N**3
        + sweeps * (N * (N - 1) // 2) * 12 * N
        + 2 * N**3 + 8 * N * N + N)
    fused_bytes = L * B * f32 * ((4 + nmom) + (2 * N * N + 5 * N))
    bvp_flops = L * B * (
        (2 * (2 * N) ** 3) // 3 + 6 * (2 * N) ** 2)
    # fwd: read 2N^2+N+2N, write 2N^2+2N; bwd: read 2N^2+N+2N^2+2N+... ,
    # write 2N  (see module docstring)
    bvp_bytes = L * B * f32 * (
        (2 * N * N + N + 2 * N) + (2 * N * N + 2 * N)          # fwd r/w
        + (2 * N * N + N + 2 * N * N + 2 * N + N) + 2 * N)     # bwd r/w
    return (fused_flops, fused_bytes), (bvp_flops, bvp_bytes)


def main(ncol=8192, nwave=8, nlyr=100, nstr=8):
    import jax
    import jax.numpy as jnp

    from pyharp_tpu.rt.disort import solver as S
    from pyharp_tpu.rt.disort.pallas_kernels import (
        fused_homogeneous_thermal, solve_bvp_pallas)
    from .profile import roofline, _peaks

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    dtype = jnp.float32
    N = nstr // 2
    L, B = nlyr, nwave * ncol
    nmom = nstr
    # must mirror the kernel's default sweep count (pallas_kernels.py)
    sweeps = 3 if N <= 2 else (4 if N <= 4 else 8)
    ang = S.make_static_angles(nstr, nstr, 0)

    rng = np.random.default_rng(0)
    ssa = jnp.asarray(rng.uniform(0.0, 0.6, (L, B)), dtype)
    pmom = jnp.asarray(rng.uniform(0.0, 0.3, (L, nmom, B)), dtype)
    dtau = jnp.asarray(rng.uniform(0.001, 0.8, (L, B)), dtype)
    btop = jnp.asarray(rng.uniform(0.0, 1.0, (L, B)), dtype)
    slope = jnp.asarray(rng.uniform(-0.1, 0.1, (L, B)), dtype)
    albedo = jnp.full((B,), 0.1, dtype)

    (f_fl, f_by), (b_fl, b_by) = kernel_counts(L, B, N, nmom, sweeps)

    # measured fns reduce their outputs to one scalar INSIDE the jit: the
    # kernel still writes everything to HBM (counted in bytes_moved), but
    # queued iterations then hold only a scalar live each — returning the
    # raw ~1.5 GB output tuple from 10 queued calls would pin ~15 GB of
    # HBM and stall the allocator
    def _ck(*outs):
        # scalar corner reads only: a strided ravel would force a tiled->
        # linear relayout copy of every output (~GBs), polluting the timing
        return sum(o[(0,) * o.ndim] for o in outs)

    fused = jax.jit(lambda s, p, d, bt, sl: _ck(*fused_homogeneous_thermal(
        s, p, d, bt, sl, ang)))
    r_fused = roofline(fused, ssa, pmom, dtau, btop, slope,
                       flops=f_fl, bytes_moved=f_by)

    # BVP inputs from one real eigen pass (host-side prep, not timed)
    gp, gm, lam, expd, y0p, y0m, y1 = jax.block_until_ready(
        jax.jit(lambda s, p, d, bt, sl: fused_homogeneous_thermal(
            s, p, d, bt, sl, ang))(ssa, pmom, dtau, btop, slope))
    sol = S.LayerSolution(lam, gp, gm, expd)
    ptop_p = y0p
    ptop_m = y0m
    pbot_p = y0p + y1 * dtau[None]
    pbot_m = y0m + y1 * dtau[None]
    ftop = jnp.zeros((N, B), dtype)
    bot_rhs = -pbot_p[:, -1]

    bvp = jax.jit(lambda sol, tp, tm, bp, bm, ft, br, al: _ck(
        *solve_bvp_pallas(sol, tp, tm, bp, bm, ft, br, al, ang)))
    r_bvp = roofline(bvp, sol, ptop_p, ptop_m, pbot_p, pbot_m, ftop,
                     bot_rhs, albedo, flops=b_fl, bytes_moved=b_by)

    # flux-fused variant (the onlyfl production path): same fwd traffic,
    # backward writes (2 + eps) instead of (2N) f32 and reads ptop_p/m
    from pyharp_tpu.rt.disort.pallas_kernels import solve_bvp_flux_pallas

    # + tp/tm reads (2N), + fl writes (2), - a/b writes (2N) => net +2 f32
    f32 = 4
    bf_by = b_by + L * B * f32 * 2
    bvpf = jax.jit(lambda sol, tp, tm, bp, bm, ft, br, al: _ck(
        *solve_bvp_flux_pallas(sol, tp, tm, bp, bm, ft, br, al, ang)))
    r_bvpf = roofline(bvpf, sol, ptop_p, ptop_m, pbot_p, pbot_m, ftop,
                      bot_rhs, albedo, flops=b_fl + L * B * 2 * N * N,
                      bytes_moved=bf_by)

    p = _peaks()
    dev = jax.devices()[0].device_kind
    print(f"# ROOFLINE — Pallas DISORT kernels on {dev}")
    print()
    print(f"Problem: nstr={nstr} (N={N}), nlyr={L}, batch={B} "
          f"({nwave} g-points x {ncol} columns), f32.")
    print(f"Chip peaks used: {p['flops']/1e12:.0f} TFLOP/s, "
          f"{p['bytes']/1e9:.0f} GB/s HBM.")
    print()
    print("| kernel | time | TFLOP/s | %flop peak | GB/s | %HBM peak | bound |")
    print("|---|---|---|---|---|---|---|")
    for name, r in (("fused_homogeneous_thermal", r_fused),
                    ("solve_bvp_pallas", r_bvp),
                    ("solve_bvp_flux_pallas", r_bvpf)):
        print(f"| {name} | {r.seconds*1e3:.3f} ms | "
              f"{r.achieved_flops/1e12:.2f} | {100*r.flops_frac:.1f}% | "
              f"{r.achieved_bw/1e9:.1f} | {100*r.bw_frac:.1f}% | "
              f"{r.bound} |")
    print()
    print("FLOP/byte counts are analytic (see module docstring); both")
    print("kernels are small-N batched linear algebra (VPU work), so the")
    print("honest speed-of-light ceiling is HBM bandwidth (%HBM peak).")
    print()
    print("```json")
    print(json.dumps({
        "device": dev, "nstr": nstr, "nlyr": L, "batch": B,
        "fused": {"ms": round(r_fused.seconds * 1e3, 3),
                  "gbps": round(r_fused.achieved_bw / 1e9, 1),
                  "bw_frac": round(r_fused.bw_frac, 3)},
        "bvp": {"ms": round(r_bvp.seconds * 1e3, 3),
                "gbps": round(r_bvp.achieved_bw / 1e9, 1),
                "bw_frac": round(r_bvp.bw_frac, 3)},
    }))
    print("```")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
