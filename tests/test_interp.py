"""Unit tests for the vectorized interpolation kernel.

Checks hand values plus the reference's out-of-range clamping edge cases
(``/root/reference/src/math/interpn.h:41-49``, ``locate.h:32-37``).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pyharp_tpu.interp.interpn import interpn, interp1, locate


def scalar_interp1(x, data, axis):
    """Independent scalar reimplementation of the reference semantics."""
    n = len(axis)
    # locate
    if x < axis[0]:
        return data[0]
    if x >= axis[n - 1]:
        return data[n - 1]
    i = int(np.searchsorted(axis, x, side="right")) - 1
    x1, x2 = axis[i], axis[i + 1]
    return ((x - x1) * data[i + 1] + (x2 - x) * data[i]) / (x2 - x1)


def test_locate_matches_reference_semantics():
    axis = jnp.array([0.0, 1.0, 2.0, 3.0])
    assert locate(axis, jnp.array(-0.5)) == -1     # below range
    assert locate(axis, jnp.array(0.0)) == 0       # x == xx[0]
    assert locate(axis, jnp.array(1.5)) == 1
    assert locate(axis, jnp.array(3.0)) == 3       # x == xx[n-1] -> n-1 (clamp)
    assert locate(axis, jnp.array(9.0)) == 3       # above range


def test_interp1_hand_values():
    axis = jnp.array([0.0, 1.0, 3.0])
    data = jnp.array([10.0, 20.0, 40.0])
    x = jnp.array([0.5, 2.0, 0.0, 1.0, 3.0])
    got = interp1(x, data, axis)
    np.testing.assert_allclose(got, [15.0, 30.0, 10.0, 20.0, 40.0], rtol=1e-12)


def test_interp1_clamps_out_of_range():
    axis = jnp.array([0.0, 1.0])
    data = jnp.array([5.0, 7.0])
    got = interp1(jnp.array([-10.0, 10.0, 1.0]), data, axis)
    np.testing.assert_allclose(got, [5.0, 7.0, 7.0], rtol=0)


def test_interp1_random_vs_scalar_reference():
    rng = np.random.default_rng(0)
    axis = np.sort(rng.uniform(-5, 5, 17))
    data = rng.normal(size=17)
    xs = rng.uniform(-7, 7, 200)
    want = np.array([scalar_interp1(x, data, axis) for x in xs])
    got = interp1(jnp.asarray(xs), jnp.asarray(data), jnp.asarray(axis))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_interpn_2d_bilinear_exact_on_plane():
    # linear function must be reproduced exactly inside the grid
    ax = np.linspace(0.0, 1.0, 5)
    ay = np.linspace(-1.0, 2.0, 7)
    X, Y = np.meshgrid(ax, ay, indexing="ij")
    data = 2.0 * X - 3.0 * Y + 0.5
    rng = np.random.default_rng(1)
    qx = rng.uniform(0, 1, 50)
    qy = rng.uniform(-1, 2, 50)
    got = interpn([jnp.asarray(qx), jnp.asarray(qy)], jnp.asarray(data),
                  [jnp.asarray(ax), jnp.asarray(ay)])
    np.testing.assert_allclose(got, 2 * qx - 3 * qy + 0.5, rtol=1e-12, atol=1e-12)


def test_interpn_trailing_value_axis():
    # nval > 1: both values interpolated at once (interpn.h nval semantics)
    ax = np.array([0.0, 1.0])
    data = np.array([[1.0, 10.0], [3.0, 30.0]])  # (2, nval=2)
    got = interpn([jnp.array([0.25])], jnp.asarray(data), [jnp.asarray(ax)])
    np.testing.assert_allclose(got, [[1.5, 15.0]], rtol=1e-12)


def test_interpn_3d_matches_scipy():
    from scipy.interpolate import RegularGridInterpolator

    rng = np.random.default_rng(2)
    axes = [np.sort(rng.uniform(0, 1, n)) for n in (4, 5, 6)]
    data = rng.normal(size=(4, 5, 6))
    rgi = RegularGridInterpolator(axes, data, method="linear")
    q = np.stack([rng.uniform(a[0], a[-1], 40) for a in axes], axis=-1)
    got = interpn([jnp.asarray(q[:, i]) for i in range(3)], jnp.asarray(data),
                  [jnp.asarray(a) for a in axes])
    np.testing.assert_allclose(got, rgi(q), rtol=1e-10, atol=1e-10)
