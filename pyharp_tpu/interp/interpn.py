"""Vectorized multilinear interpolation.

TPU-native replacement for the reference's recursive scalar kernel
(``/root/reference/src/math/interpn.h:35-92``) and its bisection search
(``/root/reference/src/math/locate.h:15-41``), which were dispatched through a
torch ``TensorIterator`` elementwise hot loop
(``/root/reference/src/math/math_dispatch.cpp:14-29``).  Here the whole lookup
is expressed as ``searchsorted`` + ``gather`` over the full query batch, so XLA
fuses it into a handful of vectorized ops with no per-element control flow.

Out-of-range semantics match the reference exactly (SURVEY.md section 7
"known quirks"):

* query below the first sample       -> clamp to the first sample value
* query at or above the last sample  -> clamp to the last sample value
* interior                           -> linear weight ((x-x1)v2+(x2-x)v1)/(x2-x1)

(The reference's ``locate`` deliberately returns ``n`` when ``x == xx[n]``,
which its ``interpn`` then clamps to the last sample — see the commented line
at ``locate.h:35``.  ``searchsorted(side='right') - 1`` reproduces that.)

Axes must be strictly ascending.  Descending table axes are flipped once at
ingestion time (host side), never on device.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from jax import Array


def locate(axis: Array, x: Array) -> Array:
    """Bracketing index on an ascending axis; parity with ``locate.h:15-41``.

    Returns ``j`` with ``axis[j] <= x < axis[j+1]``; ``-1`` below range and
    ``n-1`` for ``x >= axis[n-1]`` (the reference's clamp-at-top behavior).
    """
    return jnp.searchsorted(axis, x, side="right") - 1


def _bracket(axis: Array, x: Array):
    """Clamped bracketing indices and linear weight for one axis."""
    n = axis.shape[0]
    i1 = jnp.searchsorted(axis, x, side="right") - 1
    ilo = jnp.clip(i1, 0, n - 1)
    ihi = jnp.clip(i1 + 1, 0, n - 1)
    x1 = axis[ilo]
    x2 = axis[ihi]
    dx = x2 - x1
    # Degenerate bracket (clamped): reference averages the two equal samples,
    # equivalent to weight 0.5 (interpn.h:74-75).
    t = jnp.where(dx != 0, (x - x1) / jnp.where(dx != 0, dx, 1.0), 0.5)
    return ilo, ihi, t


def interpn(
    coords: Sequence[Array],
    data: Array,
    axes: Sequence[Array],
) -> Array:
    """N-D multilinear interpolation with clamping.

    Args:
      coords: length-``ndim`` sequence of query coordinate arrays, all of one
        broadcastable batch shape ``B``.
      data: sample table of shape ``(len(axes[0]), ..., len(axes[-1]), *V)``
        where ``V`` is any trailing value shape (may be empty).
      axes: length-``ndim`` sequence of ascending 1-D sample axes.

    Returns:
      Interpolated values of shape ``B + V``.
    """
    ndim = len(axes)
    if len(coords) != ndim:
        raise ValueError(f"got {len(coords)} coords for {ndim} axes")
    coords = jnp.broadcast_arrays(*coords) if ndim > 1 else [jnp.asarray(coords[0])]

    brackets = [_bracket(jnp.asarray(a), c) for a, c in zip(axes, coords)]

    # Accumulate over the 2^ndim hypercube corners.
    batch_shape = coords[0].shape
    value_ndim = data.ndim - ndim
    out = None
    for corner in range(1 << ndim):
        idx = []
        w = jnp.ones(batch_shape, data.dtype)
        for d in range(ndim):
            ilo, ihi, t = brackets[d]
            if corner >> d & 1:
                idx.append(ihi)
                w = w * t.astype(data.dtype)
            else:
                idx.append(ilo)
                w = w * (1.0 - t).astype(data.dtype)
        v = data[tuple(idx)]
        if value_ndim:
            w = w.reshape(batch_shape + (1,) * value_ndim)
        out = w * v if out is None else out + w * v
    return out


def interp1(x: Array, data: Array, axis: Array) -> Array:
    """1-D convenience wrapper; parity with ``interpn.h:85-89``."""
    return interpn([x], data, [axis])
