"""Disort module: options, flags, forward pass (fluxes), radiances.

API parity with the pydisort torch module the reference consumes
(``/root/reference/src/radiation/radiation_band.cpp:56-70``,
``examples/amars_sw.cpp:43-65``, ``examples/amars_lw.cpp:18-38``,
``tests/test_disort.cpp:12-62``):

* ``DisortOptions``: ``header``, ``flags`` string (``lamber, quiet, onlyfl,
  planck, usrtau, usrang, ibcnd, intensity_correction,
  old_intensity_correction, general_source, output_uum, spher, print-*``),
  ``nwave``, ``ncol``, ``wave_lower``/``wave_upper`` per-bin band edges,
  ``user_mu``/``user_phi``/``user_tau``, and the ``ds()`` sizes
  ``nlyr, nstr, nmom, nphi, ntau, numu``;
* ``Disort.forward(prop, bc, temf=None) -> (nwave, ncol, nlyr+1, 2)`` flux
  up/down with **bottom-up level ordering** (level 0 = surface), matching the
  reference examples' indexing (``amars_sw.cpp:190-191``);
* ``bc`` tensors of shape ``(nwave, ncol)``: ``fbeam, umu0, albedo, btemp``
  (optionally ``ttemp, temis, fisot``);
* ``Disort.gather_rad()`` radiances at user angles (after a forward call with
  radiance output enabled).

Layer ordering convention: harp stores layers bottom-up; DISORT solves
top-down.  The flip happens exactly once, at this API boundary (SURVEY.md
section 7, "known quirks").
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from jax import Array

from ...core import index
from . import solver as _solver
from .solver import _umv, _uwdot_static
from .planck import planck_band, planck_total
from .solver import StaticAngles, make_static_angles

_KNOWN_FLAGS = {
    "ibcnd", "usrtau", "usrang", "lamber", "planck", "spher", "onlyfl",
    "quiet", "intensity_correction", "old_intensity_correction",
    "general_source", "output_uum",
    "print-input", "print-fluxes", "print-intensity", "print-transmissivity",
    "print-phase-function",
}


@dataclasses.dataclass(frozen=True)
class DisortOptions:
    """Mirror of pydisort's DisortOptions + raw disort_state sizes."""

    header: str = ""
    flags: str = ""
    nwave: int = 1
    ncol: int = 1
    wave_lower: tuple[float, ...] = ()
    wave_upper: tuple[float, ...] = ()
    user_mu: tuple[float, ...] = ()
    user_phi: tuple[float, ...] = ()
    user_tau: tuple[float, ...] = ()
    # disort_state sizes (op.ds() in the reference examples)
    nlyr: int = 1
    nstr: int = 8
    nmom: int = 8
    nphi: int = 1
    ntau: int = 1
    numu: int = 1
    # numerics
    deltam: bool = True
    accuracy: float = 0.0

    def replace(self, **kw) -> "DisortOptions":
        return dataclasses.replace(self, **kw)

    def flag_set(self) -> frozenset[str]:
        toks = [t for t in self.flags.replace(",", " ").split() if t]
        unknown = [t for t in toks if t not in _KNOWN_FLAGS]
        if unknown:
            raise ValueError(f"unknown disort flags: {unknown}")
        return frozenset(toks)

    def has(self, flag: str) -> bool:
        return flag in self.flag_set()


def _dither_for(dtype) -> float:
    return 1e-6 if dtype == jnp.float32 else 1e-12


class Disort:
    """Batched plane-parallel discrete-ordinates solver.

    One instance is configuration-only (options + static angle tables); all
    numerical state flows through ``forward`` functionally, so the module can
    be closed over by ``jax.jit`` / ``pjit`` without tracing hazards.
    """

    def __init__(self, options: DisortOptions):
        fl = options.flag_set()  # validates
        if options.has("ibcnd"):
            raise NotImplementedError(
                "ibcnd (albedo/transmissivity special mode) is not supported"
            )
        if options.nstr < 2 or options.nstr % 2:
            raise ValueError("nstr must be even and >= 2")
        self.options = options
        self._flags = fl
        self.nstr = options.nstr
        self.nmom = max(options.nmom, options.nstr)
        # mode 0 is always needed (fluxes); higher modes for radiances
        self._ang0: StaticAngles = make_static_angles(self.nstr, self.nmom, 0)
        self._rad = None  # cached radiance field from the last forward

    # -- helpers -----------------------------------------------------------

    def _band_edges(self, dtype):
        wl = self.options.wave_lower
        wu = self.options.wave_upper
        if not wl or not wu:
            return None, None
        return (jnp.asarray(np.asarray(wl), dtype),
                jnp.asarray(np.asarray(wu), dtype))

    # -- main entry --------------------------------------------------------

    def forward(
        self,
        prop: Array,
        bc: dict[str, Array],
        temf: Array | None = None,
    ) -> Array:
        """Solve all (wave, col) problems; return level fluxes.

        Args:
          prop: ``(nwave, ncol, nlyr, nprop)`` **bottom-up** optical
            properties: ``prop[...,0]`` optical thickness tau per layer,
            ``prop[...,1]`` single-scattering albedo (optional),
            ``prop[...,2:]`` phase moments g_1.. (optional).
          bc: boundary tensors ``(nwave, ncol)`` (broadcastable):
            ``fbeam, umu0, albedo, btemp`` (+ ``ttemp, temis, fisot``).
          temf: level temperatures ``(ncol, nlyr+1)`` bottom-up (required
            with the ``planck`` flag).

        Returns:
          ``(nwave, ncol, nlyr+1, 2)`` with ``[..., IUP]`` upward flux and
          ``[..., IDN]`` total (direct+diffuse) downward flux, levels
          **bottom-up** (level 0 = surface) like the reference examples.
        """
        opts = self.options
        dtype = prop.dtype
        nwave, ncol, nlyr, nprop = prop.shape
        Bflat = nwave * ncol
        L = nlyr
        planck_on = self.options.has("planck")

        # ---- batch-last internal layout: (L, nprop, B), top-down layers ----
        P = jnp.transpose(prop.reshape(Bflat, nlyr, nprop), (1, 2, 0))
        P = jnp.flip(P, axis=0)
        tau = jnp.maximum(P[:, index.IEX], 0.0)                 # (L, B)
        ssa = (jnp.clip(P[:, index.ISS], 0.0, 1.0)
               if nprop > 1 else jnp.zeros_like(tau))
        pmom = P[:, index.IPM:]                                  # (L, nmom, B)

        def bc_get(name, default):
            v = jnp.asarray(bc.get(name, default), dtype)
            return jnp.broadcast_to(v, (nwave, ncol)).astype(dtype).reshape(Bflat)

        fbeam = bc_get("fbeam", 0.0)
        umu0 = bc_get("umu0", 1.0)
        albedo = bc_get("albedo", 0.0)
        fisot = bc_get("fisot", 0.0)

        # ---- delta-M scaling (cdisort's DELTAM; no-op for zero moments) ----
        if opts.deltam and pmom.shape[1] >= self.nstr:
            f = pmom[:, self.nstr - 1]
        else:
            f = jnp.zeros_like(tau)
        one = jnp.asarray(1.0, dtype)
        tau_s = (one - ssa * f) * tau
        ssa_s = ssa * (one - f) / (one - ssa * f)
        if pmom.shape[1] > 0:
            pmom_s = (pmom - f[:, None]) / (one - f[:, None])
        else:
            pmom_s = pmom

        # dither ssa away from the conservative limit (cdisort does the same)
        dither = _dither_for(dtype)
        ssa_s = jnp.clip(ssa_s, 0.0, 1.0 - dither)

        # cumulative optical depth at levels (top-down), scaled and unscaled
        zeros1 = jnp.zeros((1, Bflat), dtype)
        taucum_s = jnp.concatenate([zeros1, jnp.cumsum(tau_s, axis=0)], axis=0)
        taucum_u = jnp.concatenate([zeros1, jnp.cumsum(tau, axis=0)], axis=0)

        # ---- thermal (Planck) source coefficients ----
        if planck_on:
            if temf is None:
                raise ValueError("planck flag requires temf level temperatures")
            btemp2 = jnp.broadcast_to(
                jnp.asarray(bc.get("btemp", jnp.zeros((), dtype)), dtype),
                (nwave, ncol))
            ttemp2 = jnp.broadcast_to(
                jnp.asarray(bc.get("ttemp", jnp.zeros((), dtype)), dtype),
                (nwave, ncol))
            temis2 = jnp.broadcast_to(
                jnp.asarray(bc.get("temis", jnp.zeros((), dtype)), dtype),
                (nwave, ncol))
            # temf: (ncol, nlvl) bottom-up -> top-down levels (nlvl, ncol)
            tlev = jnp.flip(jnp.asarray(temf, dtype), axis=-1).T
            wnlo, wnhi = self._band_edges(dtype)
            if wnlo is None:
                blev = jnp.broadcast_to(
                    planck_total(tlev)[:, None, :], (L + 1, nwave, ncol))
                bsurf = planck_total(btemp2)
                btop2 = temis2 * planck_total(ttemp2)
            else:
                blev = planck_band(tlev[:, None, :], wnlo[None, :, None],
                                   wnhi[None, :, None])  # (nlvl, nwave, ncol)
                bsurf = planck_band(btemp2, wnlo[:, None], wnhi[:, None])
                btop2 = temis2 * planck_band(ttemp2, wnlo[:, None],
                                             wnhi[:, None])
            blev = blev.reshape(L + 1, Bflat)
            bsurf = bsurf.reshape(Bflat)
            btop = btop2.reshape(Bflat)
            dt = taucum_s[1:] - taucum_s[:-1]
            b_top_lay = blev[:-1]
            slope = jnp.where(dt > 1e-20,
                              (blev[1:] - b_top_lay) / jnp.maximum(dt, 1e-20),
                              0.0)
        else:
            bsurf = jnp.zeros((Bflat,), dtype)
            btop = jnp.zeros((Bflat,), dtype)
            b_top_lay = jnp.zeros_like(tau)
            slope = jnp.zeros_like(tau)

        # ---- homogeneous + particular solutions, azimuthal mode m = 0 ----
        ang = self._ang0
        N = self.nstr // 2
        mu = jnp.asarray(ang.mu, dtype)
        w = jnp.asarray(ang.w, dtype)
        dtau_s = taucum_s[1:] - taucum_s[:-1]           # (L, B)

        sol, Vfull, Ufull = _solver.homogeneous_solution(
            ssa_s, pmom_s, dtau_s, ang)

        zp, zm = _solver.beam_particular(
            sol, Vfull, Ufull, ssa_s, pmom_s, fbeam, umu0, ang)
        # beam attenuation at layer tops/bottoms (scaled tau inside solver)
        att_top = jnp.exp(-taucum_s[:-1] / umu0[None])   # (L, B)
        att_bot = jnp.exp(-taucum_s[1:] / umu0[None])
        y0p, y0m, y1 = _solver.thermal_particular(
            Vfull, Ufull, ssa_s, b_top_lay, slope, ang)

        ptop_p = zp * att_top[None] + y0p                # (N, L, B)
        ptop_m = zm * att_top[None] + y0m
        pbot_p = zp * att_bot[None] + y0p + y1 * dtau_s[None]
        pbot_m = zm * att_bot[None] + y0m + y1 * dtau_s[None]

        # ---- boundary right-hand sides ----
        ftop = jnp.broadcast_to((fisot + btop)[None, :], (N, Bflat))
        # bottom: I+ = alb/pi * mu0 F0 e^{-tauL/mu0} + 2 alb sum w mu I-
        #             + (1-alb) B(btemp)
        att_L = jnp.exp(-taucum_s[-1] / umu0)
        direct_refl = albedo / jnp.pi * umu0 * fbeam * att_L
        emit = (1.0 - albedo) * bsurf
        pb_p = pbot_p[:, -1]                              # (N, B)
        pb_m = pbot_m[:, -1]
        wmu_np = ang.w * ang.mu
        refl_part = 2.0 * albedo * _uwdot_static(wmu_np, pb_m)
        bot_rhs = (direct_refl + emit + refl_part)[None] - pb_p

        a, b = _solver.solve_bvp(
            sol, ptop_p, ptop_m, pbot_p, pbot_m, ftop, bot_rhs, albedo, ang)

        # ---- intensities at levels (quadrature angles), then fluxes ----
        gp, gm, E = sol.gp, sol.gm, sol.expd

        up_t = _umv(gp, a) + _umv(gm, E * b) + ptop_p    # (N, L, B) at tops
        dn_t = _umv(gm, a) + _umv(gp, E * b) + ptop_m

        gpL = gp[:, :, -1]                                # (N, N, B)
        gmL = gm[:, :, -1]
        EL = E[:, -1]
        aL = a[:, -1]
        bL = b[:, -1]
        up_bot = _umv(gpL, EL * aL) + _umv(gmL, bL) + pb_p
        dn_bot = _umv(gmL, EL * aL) + _umv(gpL, bL) + pb_m

        up_all = jnp.concatenate([up_t, up_bot[:, None]], axis=1)  # (N,L+1,B)
        dn_all = jnp.concatenate([dn_t, dn_bot[:, None]], axis=1)

        flup = 2.0 * jnp.pi * _uwdot_static(wmu_np, up_all)
        rfldn = 2.0 * jnp.pi * _uwdot_static(wmu_np, dn_all)

        # direct beam: reported with UNSCALED optical depth (DISORT's RFLDIR);
        # the delta-M forward-peak difference is folded into diffuse down so
        # the total downward flux stays exact.
        rfldir_u = umu0[None] * fbeam[None] * jnp.exp(-taucum_u / umu0[None])
        rfldir_s = umu0[None] * fbeam[None] * jnp.exp(-taucum_s / umu0[None])
        dn_total = rfldn + rfldir_s
        rfldn_rep = dn_total - rfldir_u

        self._last = dict(
            a=a, b=b, sol=sol, taucum_s=taucum_s, taucum_u=taucum_u,
            flup=flup, rfldn=rfldn_rep, rfldir=rfldir_u,
            up_all=up_all, dn_all=dn_all,
        )

        # (L+1, B) pair -> reference layout (nwave, ncol, nlvl, 2), bottom-up
        flux = jnp.stack([flup, dn_total], axis=-1)       # (L+1, B, 2)
        flux = jnp.transpose(flux, (1, 0, 2)).reshape(nwave, ncol, L + 1, 2)
        return jnp.flip(flux, axis=-2)

    # convenience accessors matching pydisort's API surface -----------------

    def fluxes(self):
        """Last-forward flux components (flup, rfldn, rfldir), top-down."""
        if not hasattr(self, "_last"):
            raise RuntimeError("call forward() first")
        return self._last["flup"], self._last["rfldn"], self._last["rfldir"]
