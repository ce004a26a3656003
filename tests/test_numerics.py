"""Unit tests for the batched numerics primitives (Jacobi eigh, LU solve,
Planck band integration, Legendre tables, quadrature)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pyharp_tpu.rt.disort.jacobi import jacobi_eigh
from pyharp_tpu.rt.disort.linsolve import lu_solve
from pyharp_tpu.rt.disort.planck import planck_band, planck_total
from pyharp_tpu.rt.disort.legendre import lepoly_static, lepoly
from pyharp_tpu.rt.disort.quadrature import gauss_half_range
from pyharp_tpu.core import constants


# Layout note: the batched primitives use matrix-dims-leading, batch-last
# layout ("structure of arrays", see jacobi.py docstring): A is (n, n, B).

@pytest.mark.parametrize("n", [1, 2, 4, 8])
def test_jacobi_eigh_random(n):
    rng = np.random.default_rng(n)
    A = rng.normal(size=(50, n, n))
    A = A + np.swapaxes(A, -1, -2)
    w, V = jacobi_eigh(jnp.asarray(np.moveaxis(A, 0, -1)))
    w = np.moveaxis(np.asarray(w), -1, 0)          # (B, n)
    V = np.moveaxis(np.asarray(V), -1, 0)          # (B, n, n)
    # reconstruction: A = V diag(w) V^T
    recon = np.einsum("bik,bk,bjk->bij", V, w, V)
    np.testing.assert_allclose(recon, A, atol=1e-11)
    # orthonormal columns
    np.testing.assert_allclose(
        np.einsum("bki,bkj->bij", V, V), np.broadcast_to(np.eye(n), (50, n, n)),
        atol=1e-12,
    )
    # eigenvalues match LAPACK (sorted)
    want = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(np.sort(w, axis=-1), want, atol=1e-11)


def test_jacobi_eigh_degenerate_and_diagonal():
    A = np.diag([3.0, 3.0, 1.0, 1.0])[:, :, None].repeat(4, 2)
    w, V = jacobi_eigh(jnp.asarray(A))
    np.testing.assert_allclose(np.sort(np.asarray(w), axis=0),
                               np.broadcast_to([[1.0], [1.0], [3.0], [3.0]],
                                               (4, 4)),
                               atol=1e-13)


@pytest.mark.parametrize("n,k", [(1, 1), (2, 3), (4, 1), (8, 9), (16, 2)])
def test_lu_solve_random(n, k):
    rng = np.random.default_rng(n * 10 + k)
    A = rng.normal(size=(30, n, n)) + 3 * np.eye(n)
    b = rng.normal(size=(30, n, k))
    x = lu_solve(jnp.asarray(np.moveaxis(A, 0, -1)),
                 jnp.asarray(np.moveaxis(b, 0, -1)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(x), -1, 0),
                               np.linalg.solve(A, b), rtol=1e-9, atol=1e-9)


def test_lu_solve_needs_pivoting():
    # leading zero pivot: fails without partial pivoting
    A = np.array([[0.0, 1.0], [1.0, 0.0]])[:, :, None]
    b = np.array([2.0, 3.0])[:, None]
    x = lu_solve(jnp.asarray(A), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x)[:, 0], [3.0, 2.0], atol=1e-14)


def test_lu_solve_vector_rhs():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(7, 5, 5)) + 4 * np.eye(5)
    b = rng.normal(size=(7, 5))
    x = lu_solve(jnp.asarray(np.moveaxis(A, 0, -1)),
                 jnp.asarray(np.moveaxis(b, 0, -1)))
    want = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(np.moveaxis(np.asarray(x), -1, 0), want,
                               rtol=1e-9)


def test_planck_total_stefan_boltzmann():
    T = jnp.asarray([150.0, 300.0, 5772.0])
    got = planck_band(T, 0.0, jnp.inf)
    from pyharp_tpu.rt.disort.planck import _SIGMA
    want = _SIGMA / np.pi * np.asarray(T) ** 4
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(planck_total(T)), want, rtol=1e-12)


def test_planck_band_vs_quadrature():
    from scipy.integrate import quad

    h, c, kB = constants.hPlanck, constants.cLight, constants.kBoltz

    def B_nu(nu_cm, T):  # W/m^2/sr per cm^-1
        nu = nu_cm * 100.0  # 1/m
        return 2 * h * c**2 * nu**3 / (np.exp(h * c * nu / (kB * T)) - 1) * 100.0

    for T in (150.0, 300.0, 1000.0):
        for lo, hi in ((1.0, 150.0), (150.0, 500.0), (2000.0, 50000.0), (0.5, 2.0)):
            want, _ = quad(B_nu, lo, hi, args=(T,), limit=200)
            got = float(planck_band(jnp.asarray(T), lo, hi))
            np.testing.assert_allclose(got, want, rtol=2e-8, atol=1e-12,
                                       err_msg=f"T={T} band=({lo},{hi})")


def test_planck_band_additivity():
    T = jnp.asarray(300.0)
    a = planck_band(T, 1.0, 150.0)
    b = planck_band(T, 150.0, 500.0)
    ab = planck_band(T, 1.0, 500.0)
    np.testing.assert_allclose(float(a) + float(b), float(ab), rtol=1e-10)


def test_quadrature_halfrange_exactness():
    for nstr in (2, 4, 8, 16):
        mu, w = gauss_half_range(nstr)
        assert abs(w.sum() - 1.0) < 1e-14
        n = nstr // 2
        for p in range(2 * n):  # exact up to degree 2n-1
            np.testing.assert_allclose((w * mu**p).sum(), 1.0 / (p + 1),
                                       rtol=1e-13, err_msg=f"{nstr=} {p=}")


def test_lepoly_m0_is_legendre():
    from numpy.polynomial.legendre import legval

    mu = np.linspace(-1, 1, 11)
    got = lepoly_static(mu, 0, 6)
    for l in range(7):
        want = legval(mu, np.eye(7)[l])
        np.testing.assert_allclose(got[l], want, atol=1e-13)


def test_lepoly_parity_and_orthogonality():
    mu = np.linspace(0.05, 0.95, 7)
    for m in (1, 2, 3):
        lam_p = lepoly_static(mu, m, 8)
        lam_n = lepoly_static(-mu, m, 8)
        for l in range(m, 9):
            np.testing.assert_allclose(
                lam_n[l], (-1.0) ** (l - m) * lam_p[l], atol=1e-13)
    # orthogonality: int_-1^1 Lam_l^m Lam_k^m = 2 delta_lk / (2l+1)
    x, w = np.polynomial.legendre.leggauss(40)
    for m in (0, 1, 2):
        lam = lepoly_static(x, m, 6)
        for l in range(m, 7):
            for k in range(m, 7):
                val = np.sum(w * lam[l] * lam[k])
                want = 2.0 / (2 * l + 1) if l == k else 0.0
                np.testing.assert_allclose(val, want, atol=1e-12)


def test_lepoly_traced_matches_static():
    mu = np.linspace(0.1, 0.9, 5)
    for m in (0, 1, 3):
        a = lepoly_static(mu, m, 7)
        b = np.asarray(lepoly(jnp.asarray(mu), m, 7))
        np.testing.assert_allclose(a, b, atol=1e-12)
