"""Unit tests for layer->level interpolation (vs the reference algorithm,
``/root/reference/src/utils/layer2level.cpp:7-78``)."""

import numpy as np
import jax.numpy as jnp

from pyharp_tpu.interp.layer2level import (
    Layer2LevelOptions,
    layer2level,
    k2ndOrder,
    k4thOrder,
    kConstant,
    kExtrapolate,
)


def reference_layer2level(var, order, blower, bupper):
    """Independent numpy transcription of the reference algorithm."""
    var = np.asarray(var, float)
    nlyr = var.shape[-1]
    out = np.zeros(var.shape[:-1] + (nlyr + 1,))
    if nlyr == 1:
        out[..., 0] = var[..., 0]
        out[..., 1] = var[..., 0]
        return out
    out[..., 0] = (
        (3 * var[..., 0] - var[..., 1]) / 2 if blower == kExtrapolate else var[..., 0]
    )
    if order == k4thOrder:
        out[..., 1] = (var[..., 0] + var[..., 1]) / 2
        if nlyr > 2:
            out[..., nlyr - 1] = (var[..., nlyr - 1] + var[..., nlyr - 2]) / 2
        cm = np.array([-1 / 12, 7 / 12, 7 / 12, -1 / 12])
        for lvl in range(2, nlyr - 1):
            out[..., lvl] = var[..., lvl - 2 : lvl + 2] @ cm
    else:
        out[..., 1:nlyr] = (var[..., : nlyr - 1] + var[..., 1:]) / 2
    out[..., nlyr] = (
        (3 * var[..., -1] - var[..., -2]) / 2 if bupper == kExtrapolate else var[..., -1]
    )
    return out


def test_matches_reference_all_modes():
    rng = np.random.default_rng(0)
    for nlyr in (1, 2, 3, 4, 7, 40):
        var = rng.uniform(1, 2, size=(3, nlyr))
        for order in (k2ndOrder, k4thOrder):
            for blower in (kExtrapolate, kConstant):
                for bupper in (kExtrapolate, kConstant):
                    opts = Layer2LevelOptions(
                        order=order, blower=blower, bupper=bupper,
                        check_positivity=False,
                    )
                    want = reference_layer2level(var, order, blower, bupper)
                    got = layer2level(jnp.asarray(var), opts)
                    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12,
                                               err_msg=f"{nlyr=} {order=}")


def test_linear_profile_is_exact():
    # both stencils must reproduce a linear-in-layer-index profile exactly
    var = jnp.arange(1.0, 11.0)[None, :]
    for order in (k2ndOrder, k4thOrder):
        out = layer2level(var, Layer2LevelOptions(order=order))
        np.testing.assert_allclose(out[0, 1:-1], np.arange(1.5, 10.0), rtol=1e-12)


def test_default_options_match_reference_defaults():
    o = Layer2LevelOptions()
    assert o.order == k4thOrder
    assert o.blower == kExtrapolate
    assert o.bupper == kConstant
