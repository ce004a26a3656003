"""Cell-center (layer) -> cell-interface (level) interpolation.

Parity with the reference ``layer2level`` (``/root/reference/src/utils/
layer2level.cpp:7-78``) including the 4th-order compact interior stencil
``(-1/12, 7/12, 7/12, -1/12)`` (``src/utils/interp.hpp:14-17``), the
2nd-order midpoint variant, and the extrapolate/constant boundary modes.

Differences by design (TPU-first):

* The positivity check cannot abort inside a jitted graph; instead
  ``check_positivity`` returns the level values clipped nowhere but the caller
  may request the violation mask via ``layer2level_with_mask``.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from jax import Array

k2ndOrder = 2
k4thOrder = 4

kExtrapolate = 0
kConstant = 1


@dataclasses.dataclass(frozen=True)
class Layer2LevelOptions:
    """Mirror of the reference option struct (``layer2level.hpp:22-29``)."""

    order: int = k4thOrder
    logx: bool = False
    logy: bool = False
    blower: int = kExtrapolate
    bupper: int = kConstant
    check_positivity: bool = True


def layer2level(var: Array, options: Layer2LevelOptions = Layer2LevelOptions()) -> Array:
    """Interpolate layer quantities to levels along the last axis.

    Args:
      var: layer values, shape ``(..., nlyr)``.
    Returns:
      level values, shape ``(..., nlyr + 1)``.
    """
    if options.logy:
        var = jnp.log(var)

    nlyr = var.shape[-1]
    parts = []

    # lower boundary (level 0)
    if nlyr == 1:
        lo = var[..., 0]
    elif options.blower == kExtrapolate:
        lo = (3.0 * var[..., 0] - var[..., 1]) / 2.0
    elif options.blower == kConstant:
        lo = var[..., 0]
    else:
        raise ValueError("Unsupported lower boundary condition")
    parts.append(lo[..., None])

    # interior levels 1..nlyr-1
    if nlyr > 1:
        if options.order == k4thOrder:
            mid = (var[..., :-1] + var[..., 1:]) / 2.0  # 2nd order fallback rows
            if nlyr > 3:
                # compact 4-point stencil on levels 2..nlyr-2
                cm = jnp.asarray([-1.0 / 12.0, 7.0 / 12.0, 7.0 / 12.0, -1.0 / 12.0],
                                 dtype=var.dtype)
                windows = (
                    cm[0] * var[..., 0:nlyr - 3]
                    + cm[1] * var[..., 1:nlyr - 2]
                    + cm[2] * var[..., 2:nlyr - 1]
                    + cm[3] * var[..., 3:nlyr]
                )
                mid = jnp.concatenate(
                    [mid[..., :1], windows, mid[..., -1:]], axis=-1
                )
            parts.append(mid)
        elif options.order == k2ndOrder:
            parts.append((var[..., :-1] + var[..., 1:]) / 2.0)
        else:
            raise ValueError("Unsupported interpolation order")

    # upper boundary (level nlyr)
    if nlyr == 1:
        hi = var[..., -1]
    elif options.bupper == kExtrapolate:
        hi = (3.0 * var[..., -1] - var[..., -2]) / 2.0
    elif options.bupper == kConstant:
        hi = var[..., -1]
    else:
        raise ValueError("Unsupported upper boundary condition")
    parts.append(hi[..., None])

    out = jnp.concatenate(parts, axis=-1)
    if options.logy:
        out = jnp.exp(out)
    return out


def layer2level_with_mask(var: Array, options: Layer2LevelOptions = Layer2LevelOptions()):
    """Like :func:`layer2level` but also returns a negativity mask.

    The reference aborts the process on negative interface values
    (``layer2level.cpp:68-77``); in a jitted TPU graph the caller checks the
    mask outside jit (or via ``jax.debug``) instead.
    """
    out = layer2level(var, options)
    return out, out < 0
