"""Beer-Lambert (no-scattering) RT solver.

Parity with the reference's legacy transmission integrator
(``/root/reference/src/rtsolver/rtsolver.hpp:34-64``,
``src/rtsolver/beer_lambert.cpp_:19-58``): top-down accumulation of tau/mu,
trapezoidal source integration

    I_toa = sum_i 1/2 (S[i+1] e^{-t[i+1]} + S[i] e^{-t[i]}) dtau_i / mu
          + S_surf e^{-t_surf}
          + S_surf alpha Gammaq(alpha, t_surf) t_surf^{-alpha} Gamma(alpha)

with the incomplete-gamma small-opacity correction for a
``T ~ Ts (tau/taus)^alpha`` lower boundary (``beer_lambert.cpp_:51-54``).

TPU-native: the per-ray, per-cell loops become cumulative sums along the
layer axis batched over (wave, col, ray); the solver is a cheap closed form
— no scan needed since cumsum is associative and XLA lowers it efficiently.

Flux mode (`forward`) matches the RTSolver interface: with no scattering the
up/down fluxes are the omega=0 discrete-ordinates solution computed directly
(direct beam attenuation + thermal emission integrals over the double-Gauss
hemisphere), useful as a fast LW path and as an internal cross-check of the
full DISORT solver.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from jax import Array
from jax.scipy.special import gammaincc
from jax.scipy.special import gammaln

from ..core import index
from .disort.quadrature import gauss_half_range
from .disort.planck import planck_band, planck_total


@dataclasses.dataclass(frozen=True)
class BeerLambertOptions:
    """Mirror of the reference option struct (``rtsolver.hpp:34-39``)."""

    alpha: float = 0.0  # T ~ Ts (tau/taus)^alpha lower-boundary scaling
    nstr: int = 8       # hemisphere quadrature for the flux mode
    wave_lower: tuple[float, ...] = ()
    wave_upper: tuple[float, ...] = ()


def toa_radiance(
    tau: Array,          # (..., nlyr) per-layer optical thickness, TOP-DOWN
    source: Array,       # (..., nlyr+1) source function at levels, TOP-DOWN
    mu: Array,           # (nray,) outgoing direction cosines (> 0)
    alpha: float = 0.0,
) -> Array:
    """Transmission-integrated TOA radiance per outgoing ray.

    Returns shape ``(..., nray)``.
    """
    taut = jnp.concatenate(
        [jnp.zeros_like(tau[..., :1]), jnp.cumsum(tau, axis=-1)], axis=-1
    )  # cumulative tau at levels, (..., nlyr+1)
    t = taut[..., None, :] / mu[:, None]               # (..., nray, nlvl)
    e = jnp.exp(-t)
    s = source[..., None, :]
    trap = 0.5 * (s[..., 1:] * e[..., 1:] + s[..., :-1] * e[..., :-1])
    dtau = tau[..., None, :] / mu[:, None]
    out = jnp.sum(trap * dtau, axis=-1) + s[..., -1] * e[..., -1]
    if alpha > 0:
        ts = t[..., -1]
        corr = (
            s[..., -1]
            * alpha
            * gammaincc(alpha, jnp.minimum(ts, 1000.0))
            * ts ** (-alpha)
            * jnp.exp(gammaln(alpha))
        )
        out = out + jnp.where(ts < 1000.0, corr, 0.0)
    return out


class BeerLambert:
    """No-scattering flux solver with the RTSolver forward interface."""

    def __init__(self, options: BeerLambertOptions = BeerLambertOptions()):
        self.options = options

    def forward(
        self,
        prop: Array,                      # (nwave, ncol, nlyr, nprop) bottom-up
        bc: dict[str, Array],
        temf: Array | None = None,        # (ncol, nlyr+1) bottom-up
    ) -> Array:
        """Level fluxes ``(nwave, ncol, nlyr+1, 2)``, bottom-up levels."""
        dtype = prop.dtype
        nwave, ncol, nlyr, _ = prop.shape
        tau = jnp.flip(jnp.maximum(prop[..., index.IEX], 0.0), axis=-1)
        taut = jnp.concatenate(
            [jnp.zeros((nwave, ncol, 1), dtype), jnp.cumsum(tau, axis=-1)],
            axis=-1,
        )  # (..., nlvl) top-down

        mu_q, w_q = gauss_half_range(self.options.nstr)
        mu_q = jnp.asarray(mu_q, dtype)
        w_q = jnp.asarray(w_q, dtype)

        fbeam = jnp.broadcast_to(
            jnp.asarray(bc.get("fbeam", 0.0), dtype), (nwave, ncol))
        umu0 = jnp.broadcast_to(
            jnp.asarray(bc.get("umu0", 1.0), dtype), (nwave, ncol))
        albedo = jnp.broadcast_to(
            jnp.asarray(bc.get("albedo", 0.0), dtype), (nwave, ncol))

        rfldir = umu0[..., None] * fbeam[..., None] * jnp.exp(
            -taut / umu0[..., None])

        if temf is not None:
            btemp = jnp.broadcast_to(
                jnp.asarray(bc.get("btemp", 0.0), dtype), (nwave, ncol))
            tlev = jnp.flip(jnp.asarray(temf, dtype), axis=-1)[None]
            wl = self.options.wave_lower
            wu = self.options.wave_upper
            if wl and wu:
                lo = jnp.asarray(wl, dtype)[:, None, None]
                hi = jnp.asarray(wu, dtype)[:, None, None]
                B = planck_band(tlev, lo, hi)
                Bsurf = planck_band(
                    btemp, jnp.asarray(wl, dtype)[:, None],
                    jnp.asarray(wu, dtype)[:, None])
            else:
                B = planck_total(tlev) * jnp.ones((nwave, 1, 1), dtype)
                Bsurf = planck_total(btemp)
        else:
            B = jnp.zeros((nwave, ncol, nlyr + 1), dtype)
            Bsurf = jnp.zeros((nwave, ncol), dtype)

        # per-quadrature-angle transmission integrals, trapezoid in-layer:
        # downward at level l: sum over layers above; upward: below + surface
        t_ang = taut[..., None, :] / mu_q[:, None]       # (...,nq,nlvl)
        dt = t_ang[..., 1:] - t_ang[..., :-1]
        Bq = B[..., None, :]

        # I-(l) = sum_{i<l} 1/2 (B_i e^{-(t_l - t_i)} + ...) trapezoid
        # computed stably via prefix sums of e^{+t_i} weighted terms:
        # I-(l) = e^{-t_l} * sum_{i<l} 1/2 (B_{i+1} e^{t_{i+1}} + B_i e^{t_i}) dt_i
        # guard overflow by accumulating relative to running max: use scan-free
        # log-sum trick is overkill; clamp t to 80 for the exp difference form:
        # instead integrate per layer with local attenuation products.
        trans = jnp.exp(-dt)                              # per-layer transmission
        # downward sweep: I-_0 = 0; I-_{l+1} = I-_l * trans_l + emis_l
        emis_dn = 0.5 * (Bq[..., 1:] + Bq[..., :-1] * trans) * dt
        emis_up = 0.5 * (Bq[..., :-1] + Bq[..., 1:] * trans) * dt

        def cumprod_paths(trans, emis, reverse):
            # I_{l} accumulated along the sweep (associative scan)
            import jax.lax as lax

            def step(carry, xs):
                tr, em = xs
                new = carry * tr + em
                return new, new

            from .disort.solver import match_vma

            x = (jnp.moveaxis(trans, -1, 0), jnp.moveaxis(emis, -1, 0))
            init = match_vma(jnp.zeros(trans.shape[:-1], trans.dtype), trans)
            if reverse:
                x = (x[0][::-1], x[1][::-1])
            _, ys = lax.scan(step, init, x)
            if reverse:
                ys = ys[::-1]
            return jnp.moveaxis(ys, 0, -1)

        Idn_in = cumprod_paths(trans, emis_dn, reverse=False)   # levels 1..L
        Idn = jnp.concatenate([jnp.zeros_like(Idn_in[..., :1]), Idn_in], axis=-1)

        # upward: surface intensity = emission + Lambertian reflection of beam
        dn_dir_srf = umu0 * fbeam * jnp.exp(-taut[..., -1] / umu0)
        dn_dif_srf = 2.0 * jnp.pi * jnp.einsum(
            "j,...j->...", w_q * mu_q, Idn[..., -1])
        Isurf_scalar = (albedo / jnp.pi * (dn_dir_srf + dn_dif_srf)
                        + (1.0 - albedo) * Bsurf)         # (nwave, ncol)
        Isurf = jnp.broadcast_to(
            Isurf_scalar[..., None], Isurf_scalar.shape + (mu_q.shape[0],)
        )  # isotropic over quadrature angles

        def up_accumulate(trans, emis, init):
            import jax.lax as lax

            def step(carry, xs):
                tr, em = xs
                new = carry * tr + em
                return new, new

            x = (jnp.moveaxis(trans, -1, 0)[::-1],
                 jnp.moveaxis(emis, -1, 0)[::-1])
            _, ys = lax.scan(step, init, x)
            ys = ys[::-1]
            return jnp.moveaxis(ys, 0, -1)

        Iup_in = up_accumulate(trans, emis_up, Isurf)      # levels 0..L-1
        Iup = jnp.concatenate([Iup_in, Isurf[..., None]], axis=-1)

        wmu = w_q * mu_q
        flup = 2.0 * jnp.pi * jnp.einsum("j,...jl->...l", wmu, Iup)
        rfldn = 2.0 * jnp.pi * jnp.einsum("j,...jl->...l", wmu, Idn)

        flux = jnp.stack([flup, rfldn + rfldir], axis=-1)
        return jnp.flip(flux, axis=-2)
