"""Batched dense linear solve for tiny fixed-size systems.

The DISORT core needs millions of independent N x N (N <= 16) solves per
step.  XLA's generic ``LuDecomposition`` path is a poor fit (and lacks an
f64 TPU lowering entirely), so this module unrolls Gaussian elimination with
partial pivoting over the *static* matrix dimension: every operation is an
elementwise/VPU op over the whole batch, with no per-problem control flow —
the TPU-native inversion of cdisort's per-problem LINPACK calls (SGECO/SGESL,
SURVEY.md section 2.3 item 1).
"""

from __future__ import annotations

import jax.numpy as jnp


def lu_solve(A, b):
    """Solve ``A x = b`` for batches of small square systems.

    Args:
      A: ``(..., n, n)``.
      b: ``(..., n)`` or ``(..., n, k)``.

    Returns:
      ``x`` with the same shape as ``b``.
    """
    vec = b.ndim == A.ndim - 1
    if vec:
        b = b[..., None]
    n = A.shape[-1]
    # augmented system keeps the row swaps cheap (single tensor)
    M = jnp.concatenate([A, b.astype(A.dtype)], axis=-1)  # (..., n, n+k)

    for k in range(n):
        col = jnp.abs(M[..., :, k])
        if k > 0:
            mask = jnp.zeros((n,), col.dtype).at[:k].set(1.0)
            col = jnp.where(mask.astype(bool), -1.0, col)
        p = jnp.argmax(col, axis=-1)  # (...,) pivot row index >= k

        # swap rows k and p (batched): gather row p, scatter row k into p
        rowk = M[..., k, :]
        rowp = jnp.take_along_axis(M, p[..., None, None], axis=-2)[..., 0, :]
        M = M.at[..., k, :].set(rowp)
        ridx = jnp.arange(n)
        is_p = (ridx[..., :, None] == p[..., None, None]) & (
            p[..., None, None] != k
        )
        M = jnp.where(is_p, rowk[..., None, :], M)

        # eliminate below the pivot
        pivot = M[..., k, k]
        inv = 1.0 / pivot
        factors = M[..., :, k] * inv[..., None]          # (..., n)
        below = (ridx > k).astype(M.dtype)
        update = (factors * below)[..., :, None] * M[..., k, None, :]
        M = M - update

    # back substitution on the upper-triangular augmented system
    x = M[..., :, n:]
    U = M[..., :, :n]
    out = jnp.zeros_like(x)
    for k in range(n - 1, -1, -1):
        acc = x[..., k, :]
        if k < n - 1:
            acc = acc - jnp.einsum(
                "...j,...jm->...m", U[..., k, k + 1:], out[..., k + 1:, :]
            )
        out = out.at[..., k, :].set(acc / U[..., k, k][..., None])

    if vec:
        out = out[..., 0]
    return out
