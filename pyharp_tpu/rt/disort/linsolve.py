"""Batched dense linear solve for tiny fixed-size systems.

The DISORT core needs millions of independent N x N (N <= 16) solves per
step.  XLA's generic ``LuDecomposition`` path is a poor fit (and lacks an
f64 TPU lowering entirely), so this module unrolls Gaussian elimination with
partial pivoting over the *static* matrix dimension — the TPU-native
inversion of cdisort's per-problem LINPACK calls (SGECO/SGESL, SURVEY.md
section 2.3 item 1).

Representation: **row-scalarized** — the augmented system is a Python list of
``(ncols, batch)`` row arrays.  Row swaps and eliminations are then single
whole-row vector ops (a handful of XLA instructions per pivot step), while a
fully scalarized or fully tensorized form is orders of magnitude worse:
per-element scalarization explodes the instruction count (LLVM/Mosaic
codegen blow-up), and ``(n, n, batch)`` tensors with ``.at[].set`` updates
materialize the whole batch per step.

Partial pivoting cannot branch per batch element; each elimination step
bubbles the max-|pivot| row up with elementwise ``where`` swaps.
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
    vec = b.ndim == A.ndim - 1
    if vec:
        b = b[:, None]

    # row-scalarized augmented system: rows[i] is (n + k, *batch)
    rows = [jnp.concatenate([A[i], b[i].astype(A.dtype)], axis=0)
            for i in range(n)]

    for col in range(n):
        # bubble the max-|entry| row (among col..n-1) into position `col`
        for r in range(col + 1, n):
            swap = jnp.abs(rows[r][col]) > jnp.abs(rows[col][col])
            hi = jnp.where(swap, rows[r], rows[col])
            lo = jnp.where(swap, rows[col], rows[r])
            rows[col] = hi
            rows[r] = lo
        inv = 1.0 / rows[col][col]
        for r in range(col + 1, n):
            f = rows[r][col] * inv
            rows[r] = rows[r] - f[None] * rows[col]

    # back substitution: x[row] spans the k rhs columns, shape (k, *batch)
    x = [None] * n
    for row in range(n - 1, -1, -1):
        acc = rows[row][n:]
        for col in range(row + 1, n):
            acc = acc - rows[row][col][None] * x[col]
        x[row] = acc / rows[row][row][None]

    out = jnp.stack(x, axis=0)
    if vec:
        out = out[:, 0]
    return out


def cholesky_lower(A, floor=1e-30):
    """Batched Cholesky of tiny SPD matrices, scalarized.

    Args:
      A: ``(n, n, *batch)`` symmetric positive definite (diagonal floored).

    Returns:
      ``L`` of shape ``(n, n, *batch)`` lower-triangular with
      ``A ~= L L^T``.  Unrolled over the static dimension — ~n^3/6 fused
      VPU ops, an order of magnitude cheaper than an eigendecomposition
      when only a symmetric square-root factor is needed.
    """
    n = A.shape[0]
    Lc = [[None] * n for _ in range(n)]
    for j in range(n):
        d = A[j, j]
        for k in range(j):
            d = d - Lc[j][k] * Lc[j][k]
        d = jnp.sqrt(jnp.maximum(d, floor))
        Lc[j][j] = d
        inv = 1.0 / d
        for i in range(j + 1, n):
            v = A[i, j]
            for k in range(j):
                v = v - Lc[i][k] * Lc[j][k]
            Lc[i][j] = v * inv
    zero = jnp.zeros_like(A[0, 0])
    rows = [jnp.stack([Lc[i][j] if j <= i else zero for j in range(n)], axis=0)
            for i in range(n)]
    return jnp.stack(rows, axis=0)
