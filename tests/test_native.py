"""Native runtime library (csrc/harp_native.cpp) vs the Python/JAX paths.

The native library is both a host-side fast path (ASCII ingestion) and an
independent oracle for the JAX interpolation kernels: it implements the
reference's locate/interpn semantics (``/root/reference/src/math/locate.h``,
``interpn.h``) in scalar C++, so agreement here is cross-language evidence
that the vectorized searchsorted+gather kernel preserves the reference
behavior (including out-of-range clamping and degenerate brackets).
"""

import io
import os

import numpy as np
import pytest

from pyharp_tpu import _native
from pyharp_tpu.interp.interpn import interpn as jax_interpn
from pyharp_tpu.tables.ascii import read_data_table

pytestmark = pytest.mark.skipif(
    not _native.available(), reason="native library unavailable (no g++)")

DATA = os.path.join(os.path.dirname(__file__), "..", "data")


# ---------------------------------------------------------------- read_table

@pytest.mark.parametrize("name", ["s8_k_fuller.txt", "h2so4.txt"])
def test_read_table_matches_numpy(name):
    path = os.path.join(DATA, name)
    native = _native.read_table(path)
    text = open(path).read()
    stripped = "\n".join(line.split("#", 1)[0] for line in text.splitlines())
    ref = np.loadtxt(io.StringIO(stripped), ndmin=2)
    np.testing.assert_array_equal(native, ref)


def test_read_table_comments_and_blank_lines(tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("# header\n1 2 3   # trailing\n\n  4 5e0 -6.5\n#only comment\n")
    out = _native.read_table(str(p))
    np.testing.assert_array_equal(out, [[1, 2, 3], [4, 5, -6.5]])


def test_read_table_errors(tmp_path):
    with pytest.raises(FileNotFoundError):
        _native.read_table(str(tmp_path / "missing.txt"))
    empty = tmp_path / "e.txt"
    empty.write_text("# nothing\n\n")
    with pytest.raises(ValueError, match="Empty"):
        _native.read_table(str(empty))
    ragged = tmp_path / "r.txt"
    ragged.write_text("1 2\n3 4 5\n")
    with pytest.raises(ValueError, match="Ragged"):
        _native.read_table(str(ragged))
    junk = tmp_path / "j.txt"
    junk.write_text("1 2\nthree 4\n")
    with pytest.raises(ValueError, match="parse"):
        _native.read_table(str(junk))


def test_read_data_table_uses_native_and_matches(tmp_path, monkeypatch):
    # public entry point dispatches to native; force-fallback must agree
    path = os.path.join(DATA, "h2so4.txt")
    via_native = read_data_table(path)
    monkeypatch.setattr(_native, "available", lambda: False)
    via_python = read_data_table(path)
    np.testing.assert_array_equal(via_native, via_python)


# ------------------------------------------------------------------- locate

def test_locate_conventions():
    ax = np.array([0.0, 1.0, 2.0, 4.0])
    assert _native.locate(ax, -0.5) == -1        # below range
    assert _native.locate(ax, 0.0) == 0          # at first sample
    assert _native.locate(ax, 1.5) == 1          # interior
    assert _native.locate(ax, 4.0) == 3          # at last sample -> clamp top
    assert _native.locate(ax, 9.0) == 3          # above range


def test_locate_descending():
    ax = np.array([4.0, 2.0, 1.0, 0.0])
    assert _native.locate(ax, 1.5) == 1
    assert _native.locate(ax, 5.0) == -1


# ------------------------------------------------------------------ interpn

@pytest.mark.parametrize("ndim,vshape", [(1, ()), (1, (3,)), (2, ()),
                                         (2, (2,)), (3, ()), (3, (4,))])
def test_interpn_native_vs_jax(ndim, vshape):
    rng = np.random.default_rng(ndim * 10 + len(vshape))
    lens = [5, 4, 6][:ndim]
    axes = [np.sort(rng.uniform(-2, 2, n)) for n in lens]
    data = rng.normal(size=tuple(lens) + vshape)

    nq = 64
    # queries spanning interior, exact knots, and out-of-range on both sides
    coords = np.stack(
        [rng.uniform(-3, 3, nq) for _ in range(ndim)], axis=-1)
    for d in range(ndim):
        coords[d % nq, d] = axes[d][0]      # exact first knot
        coords[(d + 1) % nq, d] = axes[d][-1]  # exact last knot

    native = _native.interpn(coords, data, axes)

    jx = jax_interpn([coords[:, d] for d in range(ndim)],
                     np.asarray(data), axes)
    np.testing.assert_allclose(native, np.asarray(jx), rtol=1e-6, atol=1e-12)


def test_interpn_degenerate_axis_point():
    # duplicate knot -> 0.5/0.5 average, the reference's x2 == x1 branch
    axes = [np.array([0.0, 1.0, 1.0, 2.0])]
    data = np.array([0.0, 10.0, 20.0, 30.0])
    out = _native.interpn(np.array([[1.0]]), data, axes)
    jx = jax_interpn([np.array([1.0])], data, axes)
    np.testing.assert_allclose(out.ravel(), np.asarray(jx).ravel())
