"""Batched symmetric eigendecomposition via cyclic Jacobi rotations.

The discrete-ordinates engine needs the spectrum of one tiny symmetric matrix
(N = nstr/2, so 2x2 .. 8x8) *per (wave, column, layer)* — millions of
independent problems of fixed, compile-time size.  cdisort calls a scalar
LAPACK-style routine per problem (ASYMTX); the TPU-native shape is the
opposite: a fixed unrolled rotation schedule applied to the whole batch at
once, so every step is a plain VPU elementwise op over the huge batch.

Representation: the matrix is **fully scalarized** — a Python list-of-lists
of batch-shaped arrays, one per matrix element.  Array-typed alternatives
(``A.at[p, q].set`` on an ``(n, n, batch)`` tensor) materialize the whole
matrix batch at every rotation (~700 dynamic-update-slices of the full
buffer, measured as tens of GB of HBM traffic); with scalar components every
rotation touches only the 4n participating (batch,)-arrays and XLA fuses the
entire sweep chain into a handful of kernels.

Cyclic Jacobi converges quadratically; for n <= 8 a fixed number of sweeps
reaches machine precision (validated against LAPACK in tests).
"""

from __future__ import annotations

import jax.numpy as jnp


def _rotate(A, V, p: int, q: int, n: int):
    """One batched Jacobi rotation zeroing component A[p][q] (in place)."""
    apq = A[p][q]
    app = A[p][p]
    aqq = A[q][q]

    small = jnp.abs(apq) <= jnp.finfo(apq.dtype).tiny * 1e3
    denom = jnp.where(small, 1.0, 2.0 * apq)
    tau = (aqq - app) / denom
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(jnp.sign(tau) == 0, 1.0 / (tau + jnp.sqrt(1.0 + tau * tau)), t)
    t = jnp.where(small, 0.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c

    # A <- J^T A J restricted to rows/cols p, q (A kept symmetric)
    new_pp = c * c * app - 2.0 * s * c * apq + s * s * aqq
    new_qq = s * s * app + 2.0 * s * c * apq + c * c * aqq
    for r in range(n):
        if r == p or r == q:
            continue
        arp = A[r][p]
        arq = A[r][q]
        nrp = c * arp - s * arq
        nrq = s * arp + c * arq
        A[r][p] = nrp
        A[p][r] = nrp
        A[r][q] = nrq
        A[q][r] = nrq
    A[p][p] = new_pp
    A[q][q] = new_qq
    zero = jnp.zeros_like(apq)
    A[p][q] = zero
    A[q][p] = zero

    for r in range(n):
        vrp = V[r][p]
        vrq = V[r][q]
        V[r][p] = c * vrp - s * vrq
        V[r][q] = s * vrp + c * vrq
    return A, V


def jacobi_eigh(A, sweeps: int | None = None):
    """Eigendecomposition of a batch of symmetric matrices.

    Args:
      A: ``(n, n, *batch)`` symmetric in the leading two dims (only the
        symmetric part is used).
      sweeps: number of full cyclic sweeps (default: enough for n <= 8).

    Returns:
      ``(w, V)`` with ``w`` of shape ``(n, *batch)`` and ``V`` of shape
      ``(n, n, *batch)`` (index 1 enumerates eigenvectors),
      ``A ~= sum_k w_k V[:,k] V[:,k]^T``.  Eigenvalues are unsorted.
    """
    n = A.shape[0]
    if sweeps is None:
        sweeps = 6 if n <= 2 else (10 if n <= 4 else 14)

    # scalarize (symmetrized)
    Ac = [[0.5 * (A[i, j] + A[j, i]) for j in range(n)] for i in range(n)]
    one = jnp.ones_like(A[0, 0])
    zero = jnp.zeros_like(A[0, 0])
    Vc = [[one if i == j else zero for j in range(n)] for i in range(n)]

    if n > 1:
        # one sweep per fori_loop iteration: keeps the unrolled-rotation
        # graph to a single sweep (~350 ops for n=4) — full unrolling of all
        # sweeps produced one giant fusion that exploded LLVM/Mosaic codegen
        import jax.lax as lax

        def one_sweep(_, AV):
            Ac, Vc = [list(map(list, X)) for X in AV]
            for p in range(n - 1):
                for q in range(p + 1, n):
                    Ac, Vc = _rotate(Ac, Vc, p, q, n)
            return tuple(map(tuple, Ac)), tuple(map(tuple, Vc))

        AV = lax.fori_loop(
            0, sweeps, one_sweep,
            (tuple(map(tuple, Ac)), tuple(map(tuple, Vc))))
        Ac, Vc = [list(map(list, X)) for X in AV]

    w = jnp.stack([Ac[i][i] for i in range(n)], axis=0)
    V = jnp.stack([jnp.stack(row, axis=0) for row in Vc], axis=0)
    return w, V
