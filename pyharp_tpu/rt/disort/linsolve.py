"""Batched dense linear solve for tiny fixed-size systems.

The DISORT core needs millions of independent N x N (N <= 16) solves per
step.  XLA's generic ``LuDecomposition`` path is a poor fit (and lacks an
f64 TPU lowering entirely), so this module unrolls Gaussian elimination with
partial pivoting over the *static* matrix dimension: every operation is an
elementwise/VPU op over the whole batch, with no per-problem control flow —
the TPU-native inversion of cdisort's per-problem LINPACK calls (SGECO/SGESL,
SURVEY.md section 2.3 item 1).

Layout: matrix dims leading, batch trailing (see ``jacobi.py`` for why):
``A`` is ``(n, n, *batch)``, ``b`` is ``(n, *batch)`` or ``(n, k, *batch)``.
"""

from __future__ import annotations

import jax.numpy as jnp


def lu_solve(A, b):
    """Solve ``A x = b`` for batches of small square systems.

    Args:
      A: ``(n, n, *batch)``.
      b: ``(n, *batch)`` or ``(n, k, *batch)``.

    Returns:
      ``x`` with the same shape as ``b``.
    """
    n = A.shape[0]
    batch = A.shape[2:]
    vec = b.ndim == len(batch) + 1
    if vec:
        b = b[:, None]
    k = b.shape[1]
    # augmented system keeps the row swaps cheap (single tensor)
    M = jnp.concatenate([A, b.astype(A.dtype)], axis=1)  # (n, n+k, *batch)

    for col in range(n):
        mag = jnp.abs(M[:, col])                 # (n, *batch)
        if col > 0:
            mask = (jnp.arange(n) < col).reshape((n,) + (1,) * len(batch))
            mag = jnp.where(mask, -1.0, mag)
        p = jnp.argmax(mag, axis=0)              # (*batch,) pivot row >= col

        rowk = M[col]                            # (n+k, *batch)
        rowp = jnp.take_along_axis(M, p[None, None], axis=0)[0]
        M = M.at[col].set(rowp)
        ridx = jnp.arange(n).reshape((n,) + (1,) * (M.ndim - 1))
        is_p = (ridx == p[None, None]) & (p[None, None] != col)
        M = jnp.where(is_p, rowk[None], M)

        pivot = M[col, col]                      # (*batch,)
        inv = 1.0 / pivot
        factors = M[:, col] * inv[None]          # (n, *batch)
        below = (jnp.arange(n) > col).reshape((n,) + (1,) * len(batch))
        update = jnp.where(below, factors, 0.0)[:, None] * M[col][None]
        M = M - update

    # back substitution on the upper-triangular augmented system
    x = M[:, n:]                                 # (n, k, *batch)
    U = M[:, :n]
    out = jnp.zeros_like(x)
    for row in range(n - 1, -1, -1):
        acc = x[row]
        if row < n - 1:
            acc = acc - jnp.einsum(
                "j...,jm...->m...", U[row, row + 1:], out[row + 1:])
        out = out.at[row].set(acc / U[row, row][None])

    if vec:
        out = out[:, 0]
    return out
