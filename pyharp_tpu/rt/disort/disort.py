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
    # kernel backend: "auto" picks the fused Pallas path on TPU/f32,
    # "xla" forces the pure-XLA solver (any backend/dtype), "pallas"
    # forces the Pallas kernels (TPU, or interpret mode elsewhere)
    kernel: str = "auto"

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
        if options.nstr < 2 or options.nstr % 2:
            raise ValueError("nstr must be even and >= 2")
        self.options = options
        self._flags = fl
        self.nstr = options.nstr
        self.nmom = max(options.nmom, options.nstr)
        # mode 0 is always needed (fluxes); higher modes for radiances
        self._ang0: StaticAngles = make_static_angles(self.nstr, self.nmom, 0)
        # eager-only caches for the pydisort-parity accessors; a traced
        # forward leaves the sentinel so the accessors raise cleanly
        # instead of leaking tracers (VERDICT r3 weak item 3)
        self._rad = None
        self._last = None

    _TRACED = object()    # sentinel: last call ran under jit/vmap
    _BYPASSED = object()  # sentinel: a fused multi-band run bypassed this
    #                       solver (Radiation.forward(fuse_bands=True))

    def _stash(self, name: str, value) -> None:
        """Cache eager results for the accessors; never retain tracers."""
        import jax

        leaves = jax.tree_util.tree_leaves(value)
        if any(isinstance(x, jax.core.Tracer) for x in leaves):
            setattr(self, name, Disort._TRACED)
        else:
            setattr(self, name, value)

    # -- helpers -----------------------------------------------------------

    def _band_edges(self, dtype, bc=None):
        # traced per-bin edges (bc['wvnmlo'/'wvnmhi'], shape (nwave,)) take
        # precedence over the static options tuples: under shard_map the
        # wave axis is sharded and each device must see its local slice,
        # which only an array input can provide
        if bc is not None and "wvnmlo" in bc:
            return (jnp.asarray(bc["wvnmlo"], dtype),
                    jnp.asarray(bc["wvnmhi"], dtype))
        wl = self.options.wave_lower
        wu = self.options.wave_upper
        if not wl or not wu:
            return None, None
        return (jnp.asarray(np.asarray(wl), dtype),
                jnp.asarray(np.asarray(wu), dtype))

    # -- preparation shared by forward() and intensities() ------------------

    def _prepare(self, prop, bc, temf):
        """Unpack inputs into the batch-last internal layout, apply delta-M
        scaling + conservative-scattering dither, and build thermal source
        coefficients.  Returns a dict of (L, B)-shaped arrays."""
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

        # the beam machinery is compiled only when the caller supplies fbeam
        # (cdisort skips it at runtime when fbeam == 0; dict structure is the
        # trace-static equivalent) — a thermal-only solve skips the beam
        # particular solution, slant attenuation exponentials and rfldir
        has_beam = "fbeam" in bc
        fbeam = bc_get("fbeam", 0.0)
        umu0 = bc_get("umu0", 1.0)
        albedo = bc_get("albedo", 0.0)
        fisot = bc_get("fisot", 0.0)
        phi0 = bc_get("phi0", 0.0)

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

        # ---- direct-beam slant depths ----
        # plane-parallel: tau/mu0; spher flag: Chapman-function slant paths
        # through spherical shells (cdisort's c_chapman; needs bc["h_lev"]
        # level altitudes (ncol, nlyr+1) bottom-up + bc["radius"]).
        if not has_beam:
            chtau_s = chtau_u = mu_eff = None
        elif self.options.has("spher"):
            from .spherical import chapman_cumulative, effective_mu

            if "h_lev" not in bc or "radius" not in bc:
                raise ValueError(
                    "spher flag requires bc['h_lev'] (ncol, nlyr+1) level "
                    "altitudes and bc['radius'] planetary radius")
            hlev = jnp.asarray(bc["h_lev"], dtype)        # (ncol, L+1) bot-up
            hlev = jnp.flip(hlev, axis=-1).T              # (L+1, ncol) topdn
            hlev = jnp.broadcast_to(hlev[:, None, :],
                                    (L + 1, nwave, ncol)).reshape(L + 1, Bflat)
            radius = jnp.broadcast_to(jnp.asarray(bc["radius"], dtype),
                                      (nwave, ncol)).reshape(Bflat)
            chtau_s = chapman_cumulative(tau_s, hlev, radius, umu0)
            chtau_u = chapman_cumulative(tau, hlev, radius, umu0)
            mu_eff = effective_mu(tau_s, chtau_s)         # (L, B)
        else:
            chtau_s = taucum_s / umu0[None]
            chtau_u = taucum_u / umu0[None]
            mu_eff = None

        # ---- general (user) source at quadrature angles (m = 0) ----
        # cdisort's general_source: constant within each layer, ordered
        # (nwave, ncol, nlyr, nstr) = [q+ at mu_0.., q- at mu_0..], bottom-up.
        gensrc = None
        if self.options.has("general_source") != ("gensrc" in bc):
            # misconfiguration must not silently produce wrong results
            # (mirrors the spher h_lev/radius check)
            if self.options.has("general_source"):
                raise ValueError(
                    "general_source flag requires bc['gensrc'] "
                    "(nwave, ncol, nlyr, nstr)")
            raise ValueError(
                "bc['gensrc'] supplied without the general_source flag")
        if self.options.has("general_source"):
            gs = jnp.asarray(bc["gensrc"], dtype)
            if gs.shape != (nwave, ncol, nlyr, self.nstr):
                raise ValueError(
                    f"gensrc must be (nwave, ncol, nlyr, nstr), got {gs.shape}")
            gs = jnp.transpose(gs.reshape(Bflat, nlyr, self.nstr), (2, 1, 0))
            gs = jnp.flip(gs, axis=1)                     # top-down layers
            N = self.nstr // 2
            gensrc = (gs[:N], gs[N:])                     # (q+, q-) (N, L, B)

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
            wnlo, wnhi = self._band_edges(dtype, bc)
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

        return dict(
            dtype=dtype, nwave=nwave, ncol=ncol, L=L, B=Bflat,
            has_beam=has_beam,
            tau=tau, ssa=ssa, pmom=pmom, f_dm=f,
            tau_s=tau_s, ssa_s=ssa_s, pmom_s=pmom_s,
            taucum_s=taucum_s, taucum_u=taucum_u,
            chtau_s=chtau_s, chtau_u=chtau_u, mu_eff=mu_eff, gensrc=gensrc,
            fbeam=fbeam, umu0=umu0, albedo=albedo, fisot=fisot, phi0=phi0,
            bsurf=bsurf, btop=btop, b_top_lay=b_top_lay, slope=slope,
        )

    def _use_pallas(self, dtype) -> bool:
        kernel = getattr(self.options, "kernel", "auto")
        if kernel == "xla":
            return False
        if kernel == "pallas":
            return True
        import jax

        return jax.default_backend() == "tpu" and dtype == jnp.float32

    def _solve_mode(self, pr, ang, thermal: bool, flux_only: bool = False):
        """Eigen + particular + BVP for one azimuthal mode.

        For m > 0 the Lambertian surface reflects nothing and the top/thermal
        sources vanish (cdisort applies the same restriction).

        ``flux_only`` (the ``onlyfl`` fast path, Pallas backend only):
        fuse the level-flux contraction into the BVP backward sweep so the
        (N, L, B) a/b coefficients never round-trip through HBM and the
        separate flux-assembly pass (two more full gp/gm reads) vanishes.
        """
        dtype = pr["dtype"]
        N = self.nstr // 2
        Bflat = pr["B"]
        taucum_s = pr["taucum_s"]
        dtau_s = taucum_s[1:] - taucum_s[:-1]
        umu0 = pr["umu0"]
        fbeam = pr["fbeam"]

        zp_k = zm_k = None
        if self._use_pallas(dtype):
            from .pallas_kernels import fused_homogeneous_thermal

            if pr["has_beam"] and ang.m == 0:
                # beam particular computed IN-KERNEL on the already-live
                # operators: the XLA formulation's (N, N, L, B)
                # intermediates and batched pivoted LU cost 9.2 ms of the
                # 26.9 ms sw-lbl step / 55 ms of the aerosol-16str step
                # (r5 measurements)
                G = ang.lam_tables.shape[0]
                lam0 = _solver.lepoly(umu0, 0, G - 1)
                mur = (pr["mu_eff"] if pr["mu_eff"] is not None
                       else jnp.broadcast_to(umu0[None], pr["ssa_s"].shape))
                (gp, gm, lam, expd, y0p, y0m, y1,
                 zp_k, zm_k) = fused_homogeneous_thermal(
                    pr["ssa_s"], pr["pmom_s"], dtau_s,
                    pr["b_top_lay"], pr["slope"], ang, thermal=thermal,
                    fbeam=fbeam, mur=mur, lam0=lam0)
            else:
                gp, gm, lam, expd, y0p, y0m, y1 = fused_homogeneous_thermal(
                    pr["ssa_s"], pr["pmom_s"], dtau_s,
                    pr["b_top_lay"], pr["slope"], ang, thermal=thermal)
            sol = _solver.LayerSolution(lam, gp, gm, expd)
            # the cheap reduced operators are only needed by the
            # general-source particular solution (and the XLA beam
            # fallback for m > 0)
            if (pr["has_beam"] and zp_k is None) or pr["gensrc"] is not None:
                Vfull, Ufull = _solver.full_operators(
                    pr["ssa_s"], pr["pmom_s"], ang)
            else:
                Vfull = Ufull = None
        else:
            sol, Vfull, Ufull = _solver.homogeneous_solution(
                pr["ssa_s"], pr["pmom_s"], dtau_s, ang)
            y0p = y0m = y1 = None

        if pr["has_beam"]:
            if zp_k is not None:
                zp, zm = zp_k, zm_k
            else:
                zp, zm = _solver.beam_particular(
                    sol, Vfull, Ufull, pr["ssa_s"], pr["pmom_s"], fbeam,
                    umu0, ang, mu_eff=pr["mu_eff"])
            chtau_s = pr["chtau_s"]                      # (L+1, B) slant
            att_top = jnp.exp(-chtau_s[:-1])             # (L, B)
            att_bot = jnp.exp(-chtau_s[1:])
            att_L = jnp.exp(-chtau_s[-1])
        else:
            # no beam: the Z terms vanish; jnp.zeros is a traced constant so
            # every downstream add/mul folds away in XLA
            zshape = (N,) + pr["ssa_s"].shape
            zp = zm = jnp.zeros(zshape, dtype)
            att_top = att_bot = jnp.zeros_like(pr["ssa_s"])
            att_L = jnp.zeros((Bflat,), dtype)

        if y0p is None:   # XLA path: thermal particular not yet computed
            if thermal:
                y0p, y0m, y1 = _solver.thermal_particular(
                    Vfull, Ufull, pr["ssa_s"], pr["b_top_lay"], pr["slope"],
                    ang)
            else:
                zshape = (N,) + pr["ssa_s"].shape
                y0p = jnp.zeros(zshape, dtype)
                y0m = jnp.zeros(zshape, dtype)
                y1 = jnp.zeros(zshape, dtype)
        if pr["gensrc"] is not None and ang.m == 0:
            ygp, ygm = _solver.general_particular(
                Vfull, Ufull, pr["gensrc"][0], pr["gensrc"][1])
            y0p = y0p + ygp
            y0m = y0m + ygm

        ptop_p = zp * att_top[None] + y0p                # (N, L, B)
        ptop_m = zm * att_top[None] + y0m
        pbot_p = zp * att_bot[None] + y0p + y1 * dtau_s[None]
        pbot_m = zm * att_bot[None] + y0m + y1 * dtau_s[None]
        pb_p = pbot_p[:, -1]
        pb_m = pbot_m[:, -1]

        wmu_np = ang.w * ang.mu
        if ang.m == 0:
            albedo = pr["albedo"]
            ftop = jnp.broadcast_to(
                (pr["fisot"] + pr["btop"])[None, :], (N, Bflat))
            direct_refl = (albedo / jnp.pi * umu0 * fbeam * att_L
                           if pr["has_beam"] else jnp.zeros((Bflat,), dtype))
            emit = (1.0 - albedo) * pr["bsurf"]
            refl_part = 2.0 * albedo * _uwdot_static(wmu_np, pb_m)
            bot_rhs = (direct_refl + emit + refl_part)[None] - pb_p
        else:
            albedo = jnp.zeros((Bflat,), dtype)
            ftop = jnp.zeros((N, Bflat), dtype)
            bot_rhs = -pb_p

        fl = ab_last = None
        if self._use_pallas(dtype):
            from .pallas_kernels import solve_bvp_flux_pallas, solve_bvp_pallas

            # the fused-flux backward wins for N <= 4 (the headline bench
            # path).  At N = 8 the ISOLATED kernel is faster fused too
            # (35.1 ms vs 41.3 at TB = 512, r5 A/B) but the FULL-GRAPH
            # step is ~2x slower with fusion on (250 ms vs 134.5; XLA
            # schedules the surrounding beam/eigen graph pathologically
            # around the fused call at these shapes) — in-context
            # measurement wins over the micro-benchmark, so the gate
            # stays.  The r5 TB = 512 tile fix is what lifted nstr = 16
            # throughput (782 -> ~950 cols/s at the aerosol shape).
            if flux_only and N <= 4:
                fl, fl_bot = solve_bvp_flux_pallas(
                    sol, ptop_p, ptop_m, pbot_p, pbot_m, ftop, bot_rhs,
                    albedo, ang)
                ab_last = fl_bot          # (2, B): bottom-LEVEL wmu-sums
                a = b = None
            else:
                a, b = solve_bvp_pallas(
                    sol, ptop_p, ptop_m, pbot_p, pbot_m, ftop, bot_rhs,
                    albedo, ang)
        else:
            a, b = _solver.solve_bvp(
                sol, ptop_p, ptop_m, pbot_p, pbot_m, ftop, bot_rhs,
                albedo, ang)

        return dict(sol=sol, a=a, b=b, fl=fl, ab_last=ab_last, zp=zp, zm=zm,
                    y0p=y0p, y0m=y0m, y1=y1,
                    ptop_p=ptop_p, ptop_m=ptop_m,
                    pbot_p=pbot_p, pbot_m=pbot_m,
                    pb_p=pb_p, pb_m=pb_m)

    def _modes_batched(self, pr, ups, downs, tau_sel, beam_top, mu_beam):
        """All azimuthal modes m = 1..nstr-1 in one vmapped computation.

        The mode-dependent Legendre tables are stacked into arrays and the
        whole pipeline (traced-table homogeneous solve + beam particular +
        BVP + formal-solution sweeps) is traced ONCE and ``vmap``-ed over
        the mode axis — the r4 code retraced and compiled it per mode,
        which dominated both XLA:CPU suite wall time and the TPU radiance
        compile (~70 s).  m >= 1 modes carry no thermal/boundary sources
        and no surface reflection (cdisort applies the same restrictions).

        Returns ``(lv_up, tau_up, lv_dn, tau_dn)``: level radiances
        (nmode-1, n_up, L+1, B) per hemisphere and user-tau radiances
        (nmode-1, T, n_up, B) (empty-size arrays when unused).
        """
        import jax

        from . import intensity as _intensity
        from .legendre import lepoly_static

        dtype = pr["dtype"]
        N = self.nstr // 2
        Bflat = pr["B"]
        L = pr["L"]
        nmode = self.nstr
        ms = list(range(1, nmode))
        ang0 = self._ang0
        G = ang0.lam_tables.shape[0]
        ls = np.arange(G)
        taucum_s = pr["taucum_s"]
        dtau_s = taucum_s[1:] - taucum_s[:-1]
        ssa_s, pmom_s = pr["ssa_s"], pr["pmom_s"]
        has_beam = pr["has_beam"]
        fbeam, umu0 = pr["fbeam"], pr["umu0"]
        kappa = 1.0 / (2.0 * np.pi)          # (2 - delta_m0)/4pi, m >= 1

        evens, odds, lamts, pars, keeps = [], [], [], [], []
        C_up, Cp_up, C_dn, Cp_dn = [], [], [], []
        lam0s = []
        for m in ms:
            angm = make_static_angles(self.nstr, self.nmom, m)
            e, o = _solver._phase_outer_tables(angm, np.float32)
            evens.append(e)
            odds.append(o)
            lamts.append(angm.lam_tables)
            pars.append(angm.parity)
            keeps.append(((ls >= m) & (ls <= self.nstr - 1))
                         .astype(np.float64))
            lam0s.append(_solver.lepoly(umu0, m, G - 1))   # (G, B) traced
            for mus, Cl, Cpl in ((ups, C_up, Cp_up), (downs, C_dn, Cp_dn)):
                if not mus:
                    continue
                lam_u = lepoly_static(np.asarray(mus, np.float64), m, G - 1)
                Cm = ((2 * ls + 1)[:, None] * lam_u).T        # (Mu, G)
                Cl.append(Cm)
                Cpl.append(Cm * angm.parity[None, :])

        def stk(xs):
            if xs:
                return jnp.asarray(np.stack(xs), dtype)
            return jnp.zeros((len(ms), 0, G), dtype)   # empty hemisphere

        tabs = (jnp.asarray(np.stack(evens), dtype),
                jnp.asarray(np.stack(odds), dtype),
                jnp.asarray(np.stack(lamts), dtype),
                jnp.asarray(np.stack(pars), dtype),
                jnp.asarray(np.stack(keeps), dtype),
                jnp.stack(lam0s),
                stk(C_up), stk(Cp_up), stk(C_dn), stk(Cp_dn))

        if has_beam:
            att_top = jnp.exp(-pr["chtau_s"][:-1])
            att_bot = jnp.exp(-pr["chtau_s"][1:])
        zero_alb = jnp.zeros((Bflat,), dtype)
        zvec = jnp.zeros((N, Bflat), dtype)
        T = len(tau_sel)

        def one_mode(even, odd, lamt, par, keep, lam0, Cu, Cpu, Cd, Cpd):
            sol, Vf, Uf = _solver.homogeneous_solution_t(
                ssa_s, pmom_s, dtau_s, ang0.mu, ang0.w, even, odd, keep)
            zshape = (N,) + ssa_s.shape
            if has_beam:
                zp, zm = _solver.beam_particular_t(
                    sol, Vf, Uf, ssa_s, pmom_s, fbeam, umu0, ang0.mu,
                    lamt, par, keep, lam0, kappa, mu_eff=pr["mu_eff"])
                ptop_p = zp * att_top[None]
                ptop_m = zm * att_top[None]
                pbot_p = zp * att_bot[None]
                pbot_m = zm * att_bot[None]
            else:
                zp = zm = jnp.zeros(zshape, dtype)
                ptop_p = ptop_m = pbot_p = pbot_m = jnp.zeros(zshape, dtype)
            a, b = _solver.solve_bvp(
                sol, ptop_p, ptop_m, pbot_p, pbot_m, zvec,
                -pbot_p[:, -1], zero_alb, ang0)

            zero3 = jnp.zeros(zshape, dtype)
            chi = _intensity._chi_tables_t(
                sol, zp, zm, zero3, zero3, zero3, ang0.w, lamt, par,
                self.nstr)
            g_coef = _solver._moment_coeffs_masked(
                ssa_s, pmom_s, keep, G - 1, dtype)
            zlay = jnp.zeros_like(ssa_s)
            outs = []
            for mus, up, Cx, Cpx in ((ups, True, Cu, Cpu),
                                     (downs, False, Cd, Cpd)):
                if not mus:
                    outs.append(jnp.zeros((0, L + 1, Bflat), dtype))
                    outs.append(jnp.zeros((T, 0, Bflat), dtype))
                    continue
                SA, SB, SZ, S0, S1 = _intensity._source_coeffs_batch_t(
                    Cx, Cpx, chi, g_coef, ssa_s, fbeam, lam0, zlay, zlay,
                    kappa)
                lvls = _intensity.sweep_intensity_batch(
                    mus, up, a, b, SA, SB, SZ, S0, S1, sol, taucum_s,
                    beam_top, mu_beam, jnp.zeros((Bflat,), dtype))
                outs.append(lvls)                       # (Mu, L+1, B)
                if tau_sel:
                    outs.append(jnp.stack(
                        [_intensity.partial_sweep_at_tau(
                            mus, up, a, b, SA, SB, SZ, S0, S1, sol,
                            taucum_s, beam_top, mu_beam, lvls, il, x_s)
                         for (il, x_s, _, _) in tau_sel], axis=0))
                else:
                    outs.append(jnp.zeros((0, len(mus), Bflat), dtype))
            return tuple(outs)

        lv_up, tau_up, lv_dn, tau_dn = jax.vmap(one_mode)(*tabs)
        return lv_up, tau_up, lv_dn, tau_dn

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
            ``fbeam, umu0, albedo, btemp`` (+ ``ttemp, temis, fisot, phi0``).
          temf: level temperatures ``(ncol, nlyr+1)`` bottom-up (required
            with the ``planck`` flag).

        Returns:
          ``(nwave, ncol, nlyr+1, 2)`` with ``[..., IUP]`` upward flux and
          ``[..., IDN]`` total (direct+diffuse) downward flux, levels
          **bottom-up** (level 0 = surface) like the reference examples.
        """
        if self.options.has("ibcnd"):
            raise ValueError(
                "ibcnd (albedo/transmissivity special mode) is not a flux "
                "solve; call albedo_transmissivity(prop, albedo) instead")
        pr = self._prepare(prop, bc, temf)
        md = self._solve_mode(pr, self._ang0, thermal=True, flux_only=True)
        flux, last = self._fluxes_from_mode0(pr, md)
        self._stash("_last", last)
        self._maybe_print(pr, flux)
        return flux

    # -- cdisort-style debug printing (print-* flags) -----------------------

    def _maybe_print(self, pr, flux) -> None:
        """Host-side diagnostics for the ``print-*`` flags (eager only).

        cdisort prints these tables from c_disort when the corresponding
        ``ds.flag.prnt[]`` entries are set (flags listed in
        ``/root/reference/examples/amarsw-ck.yaml:96-103``).  Under
        ``jit``/``vmap`` the values are tracers and nothing is printed —
        printing is a host-side effect that cannot live in a traced graph.
        """
        want = self._flags & {"print-input", "print-fluxes",
                              "print-phase-function"}
        if not want:
            return
        import jax

        leaves = jax.tree_util.tree_leaves((pr["tau"], flux))
        if any(isinstance(x, jax.core.Tracer) for x in leaves):
            return
        opts = self.options
        hdr = opts.header or "DISORT"
        if "print-input" in self._flags:
            print(f"\n{hdr}: input (wave 0, col 0); nlyr={opts.nlyr} "
                  f"nstr={self.nstr} nmom={self.nmom}")
            tau0 = np.asarray(pr["tau"])[:, 0]
            ssa0 = np.asarray(pr["ssa"])[:, 0]
            print(" layer       dtauc       ssalb   (top-down)")
            for l in range(tau0.shape[0]):
                print(f"{l + 1:6d} {tau0[l]:12.5e} {ssa0[l]:11.5f}")
        if "print-phase-function" in self._flags:
            pm0 = np.asarray(pr["pmom"])[:, :, 0]         # (L, nmom)
            print(f"\n{hdr}: phase moments g_1..g_{pm0.shape[1]} "
                  "(wave 0, col 0, top-down)")
            for l in range(pm0.shape[0]):
                vals = " ".join(f"{v:9.5f}" for v in pm0[l, :8])
                print(f"{l + 1:6d} {vals}")
        if "print-fluxes" in self._flags:
            f0 = np.asarray(flux)[0, 0]                   # (nlvl, 2) bottom-up
            rfldir = (np.asarray(self._last["rfldir"])[:, 0]
                      if isinstance(self._last, dict) else
                      np.zeros(f0.shape[0]))
            print(f"\n{hdr}: fluxes (wave 0, col 0)")
            print(" level      direct     diffuse-down    flux-up  "
                  "(level 0 = TOA)")
            nlvl = f0.shape[0]
            for i in range(nlvl):
                b = nlvl - 1 - i                          # bottom-up index
                dn_diff = f0[b, 1] - rfldir[i]
                print(f"{i:6d} {rfldir[i]:12.5e} {dn_diff:14.5e} "
                      f"{f0[b, 0]:12.5e}")

    def _fluxes_from_mode0(self, pr, md):
        nwave, ncol, L = pr["nwave"], pr["ncol"], pr["L"]
        taucum_s, taucum_u = pr["taucum_s"], pr["taucum_u"]
        umu0, fbeam = pr["umu0"], pr["fbeam"]
        ang = self._ang0
        sol = md["sol"]
        gp, gm, E = sol.gp, sol.gm, sol.expd
        wmu_np = ang.w * ang.mu
        gpL = gp[:, :, -1]
        gmL = gm[:, :, -1]
        EL = E[:, -1]

        if md.get("fl") is not None:
            # fused Pallas path: BOTH the layer-top and bottom-level
            # wmu-sums come out of the BVP backward kernel, so this
            # epilogue consumes kernel outputs ONLY — touching gp/gm or
            # the particular solutions here would make XLA rematerialize
            # the whole upstream graph instead of holding the multi-GB
            # live set across the kernel (measured 2x step time, r5)
            fl_bot = md["ab_last"]                       # (2, B)
            flup = 2.0 * jnp.pi * jnp.concatenate(
                [md["fl"][0], fl_bot[0][None]], axis=0)
            rfldn = 2.0 * jnp.pi * jnp.concatenate(
                [md["fl"][1], fl_bot[1][None]], axis=0)
            up_all = dn_all = None   # node radiances not materialized here
        else:
            a, b = md["a"], md["b"]
            up_t = _umv(gp, a) + _umv(gm, E * b) + md["ptop_p"]  # (N, L, B)
            dn_t = _umv(gm, a) + _umv(gp, E * b) + md["ptop_m"]

            aL = a[:, -1]
            bL = b[:, -1]
            up_bot = _umv(gpL, EL * aL) + _umv(gmL, bL) + md["pb_p"]
            dn_bot = _umv(gmL, EL * aL) + _umv(gpL, bL) + md["pb_m"]

            up_all = jnp.concatenate([up_t, up_bot[:, None]], axis=1)
            dn_all = jnp.concatenate([dn_t, dn_bot[:, None]], axis=1)

            flup = 2.0 * jnp.pi * _uwdot_static(wmu_np, up_all)
            rfldn = 2.0 * jnp.pi * _uwdot_static(wmu_np, dn_all)

        # direct beam: reported with UNSCALED optical depth (DISORT's RFLDIR);
        # the delta-M forward-peak difference is folded into diffuse down so
        # the total downward flux stays exact.  Slant (Chapman) depths under
        # the spher flag, taucum/umu0 otherwise.
        if pr["has_beam"]:
            rfldir_u = umu0[None] * fbeam[None] * jnp.exp(-pr["chtau_u"])
            rfldir_s = umu0[None] * fbeam[None] * jnp.exp(-pr["chtau_s"])
        else:
            rfldir_u = rfldir_s = jnp.zeros_like(taucum_u)
        dn_total = rfldn + rfldir_s
        rfldn_rep = dn_total - rfldir_u

        last = dict(
            a=md["a"], b=md["b"], sol=sol, taucum_s=taucum_s,
            taucum_u=taucum_u,
            flup=flup, rfldn=rfldn_rep, rfldir=rfldir_u,
            up_all=up_all, dn_all=dn_all,
        )

        # (L+1, B) pair -> reference layout (nwave, ncol, nlvl, 2), bottom-up
        flux = jnp.stack([flup, dn_total], axis=-1)       # (L+1, B, 2)
        flux = jnp.transpose(flux, (1, 0, 2)).reshape(nwave, ncol, L + 1, 2)
        return jnp.flip(flux, axis=-2), last

    # -- radiances ----------------------------------------------------------

    def intensities(
        self,
        prop: Array,
        bc: dict[str, Array],
        temf: Array | None = None,
    ) -> dict[str, Array]:
        """Fluxes plus radiances at user angles/depths.

        Computes all azimuthal modes m = 0..nstr-1 (cdisort iterates to
        convergence; a static graph computes the full set) and assembles

            u(tau, mu, phi) = sum_m u^m(tau, mu) cos(m (phi0 - phi)).

        Angles come from ``options.user_mu`` (signed, >0 up — DISORT's UMU
        convention) or default to the quadrature angles; output depths from
        ``options.user_tau`` (cumulative *unscaled* optical depth, top-down)
        or default to every level.

        Returns dict with:
          ``flux``: as :meth:`forward`;
          ``uu``: radiances ``(nwave, ncol, ntau, nphi, numu)``;
          ``uum``: azimuthal components ``(nmode, nwave, ncol, ntau, numu)``
            (cdisort's ``output_uum``).
        Level/tau ordering of ``uu`` follows user_tau order (top-down
        cumulative depths), matching pydisort's ``gather_rad``.
        """
        from . import intensity as _intensity

        pr = self._prepare(prop, bc, temf)
        dtype = pr["dtype"]
        nwave, ncol, L, Bflat = pr["nwave"], pr["ncol"], pr["L"], pr["B"]
        taucum_s = pr["taucum_s"]
        umu0, fbeam, albedo = pr["umu0"], pr["fbeam"], pr["albedo"]

        # beam attenuation entering the formal-solution sweeps: Chapman
        # slant depths + per-layer effective cosine under the spher flag
        # (consistent with the flux path), plane-parallel tau/mu0 otherwise
        if pr["has_beam"]:
            beam_top = jnp.exp(-pr["chtau_s"][:-1])            # (L, B)
            mu_beam = (pr["mu_eff"] if pr["mu_eff"] is not None
                       else jnp.broadcast_to(umu0[None], (L, Bflat)))
        else:
            beam_top = jnp.zeros((L, Bflat), dtype)
            mu_beam = jnp.ones((L, Bflat), dtype)

        user_mu = list(self.options.user_mu)
        if not user_mu:
            mus = list(self._ang0.mu)
            user_mu = [-m for m in reversed(mus)] + mus
        user_phi = list(self.options.user_phi) or [0.0]
        user_tau = list(self.options.user_tau)  # may be empty -> levels

        g_unscaled = None  # for future TMS correction
        nmode = self.nstr
        uum_levels = []   # per mode: (numu, L+1, B)
        uum_taus = []     # per mode: (numu, ntau, B) exact at user taus
        flux = None

        # ---- user-tau bracketing: map each unscaled tau to (layer, local
        # depth) once; the per-mode evaluation is then EXACT in-layer
        # (closed-form source integral), not a linear blend of level
        # radiances (cdisort USRTAU semantics) ----
        tau_sel = []      # (il, x_s) scaled / (il, x_u, t) unscaled pairs
        if user_tau:
            taucum_u = pr["taucum_u"]                   # (L+1, B)
            dtau_u_l = taucum_u[1:] - taucum_u[:-1]     # (L, B)
            dtau_s_l = taucum_s[1:] - taucum_s[:-1]
            for t in list(np.asarray(user_tau, np.float64)):
                tq = jnp.asarray(t, dtype)
                il = jnp.clip(
                    jnp.sum((taucum_u[:-1] <= tq).astype(jnp.int32), axis=0)
                    - 1, 0, L - 1)                      # (B,)
                t0 = jnp.take_along_axis(taucum_u, il[None], axis=0)[0]
                du = jnp.take_along_axis(dtau_u_l, il[None], axis=0)[0]
                dsc = jnp.take_along_axis(dtau_s_l, il[None], axis=0)[0]
                x_u = jnp.clip(tq - t0, 0.0, du)
                # delta-M rescales depth linearly within each layer
                scale = jnp.where(du > 0, dsc / jnp.where(du > 0, du, 1.0),
                                  0.0)
                tau_sel.append((il, x_u * scale, x_u, t))

        ups = tuple(mu for mu in user_mu if mu > 0)
        downs = tuple(mu for mu in user_mu if mu < 0)

        # ---- m = 0: full sources and boundaries (Pallas-backed path) ----
        ang = self._ang0
        md = self._solve_mode(pr, ang, thermal=True)
        flux, last0 = self._fluxes_from_mode0(pr, md)
        self._stash("_last", last0)
        # surface/TOA boundary intensities for the sweeps
        dn_srf_diff = last0["dn_all"][:, -1]          # (N, B)
        wmu_np = ang.w * ang.mu
        dn_flux = 2.0 * jnp.pi * _uwdot_static(wmu_np, dn_srf_diff)
        dir_flux = (umu0 * fbeam * jnp.exp(-pr["chtau_s"][-1])
                    if pr["has_beam"]
                    else jnp.zeros((Bflat,), dtype))
        surf_int = (albedo / jnp.pi * (dn_flux + dir_flux)
                    + (1.0 - albedo) * pr["bsurf"])
        top_int = pr["fisot"] + pr["btop"]

        chi = _intensity._chi_tables(
            md["sol"], md["zp"], md["zm"], md["y0p"], md["y0m"],
            md["y1"], ang)
        g_coef = _solver._moment_coeffs(
            pr["ssa_s"], pr["pmom_s"], ang, dtype)
        lam0_mu0 = _solver.lepoly(umu0, 0, ang.lam_tables.shape[0] - 1)
        lam0_list = [lam0_mu0[l] for l in range(lam0_mu0.shape[0])]

        by_mu = {}
        by_mu_tau = {}
        for mus, up, bval in ((ups, True, surf_int),
                              (downs, False, top_int)):
            if not mus:
                continue
            SA, SB, SZ, S0, S1 = _intensity._source_coeffs_batch(
                mus, chi, g_coef, pr["ssa_s"], fbeam, umu0,
                lam0_list, pr["b_top_lay"], pr["slope"], ang)
            lvls = _intensity.sweep_intensity_batch(
                mus, up, md["a"], md["b"], SA, SB, SZ, S0, S1,
                md["sol"], taucum_s, beam_top, mu_beam, bval)
            for i, mu in enumerate(mus):
                by_mu[mu] = lvls[i]                # (L+1, B)
            if tau_sel:
                at_t = [_intensity.partial_sweep_at_tau(
                    mus, up, md["a"], md["b"], SA, SB, SZ, S0, S1,
                    md["sol"], taucum_s, beam_top, mu_beam, lvls,
                    il, x_s) for (il, x_s, _, _) in tau_sel]  # (M, B) ea
                for i, mu in enumerate(mus):
                    by_mu_tau[mu] = jnp.stack(
                        [v[i] for v in at_t], axis=0)         # (T, B)
        uum_levels.append(jnp.stack(
            [by_mu[mu] for mu in user_mu], axis=0))   # (numu, L+1, B)
        if tau_sel:
            uum_taus.append(jnp.stack(
                [by_mu_tau[mu] for mu in user_mu], axis=0))  # (numu,T,B)

        # ---- m >= 1: ONE vmapped traced-table pipeline over all higher
        # azimuthal modes (no thermal, no boundary sources) — nmode-fold
        # graph-size/compile reduction vs the r4 per-mode unrolled loop
        # (VERDICT r4 next-round item 6) ----
        if nmode > 1:
            lv_up, tau_up, lv_dn, tau_dn = self._modes_batched(
                pr, ups, downs, tau_sel, beam_top, mu_beam)
            for mi in range(nmode - 1):
                bym = {}
                bymt = {}
                for i, mu in enumerate(ups):
                    bym[mu] = lv_up[mi, i]
                    if tau_sel:
                        bymt[mu] = tau_up[mi, :, i]           # (T, B)
                for i, mu in enumerate(downs):
                    bym[mu] = lv_dn[mi, i]
                    if tau_sel:
                        bymt[mu] = tau_dn[mi, :, i]
                uum_levels.append(jnp.stack(
                    [bym[mu] for mu in user_mu], axis=0))
                if tau_sel:
                    uum_taus.append(jnp.stack(
                        [bymt[mu] for mu in user_mu], axis=0))

        uum = jnp.stack(uum_levels, axis=0)   # (nmode, numu, L+1, B)

        if user_tau:
            uum_t = jnp.stack(uum_taus, axis=0)  # (nmode, numu, ntau, B)
        else:
            uum_t = uum                          # taus = all levels

        # -- azimuthal assembly (+ optional TMS intensity correction) --
        phi0 = pr["phi0"]                               # (B,)
        ntau = uum_t.shape[2]
        numu = uum_t.shape[1]
        apply_tms = ((self.options.has("intensity_correction")
                      or self.options.has("old_intensity_correction"))
                     and self.options.deltam and pr["pmom"].shape[1] > 0
                     and pr["has_beam"])
        uu_phi = []
        for phi in user_phi:
            acc = uum_t[0]
            for m in range(1, nmode):
                acc = acc + uum_t[m] * jnp.cos(m * (phi0 - phi))[None, None, :]
            if apply_tms:
                # Nakajima-Tanaka corrections (cdisort's intensity_correction
                # / old_intensity_correction path): TMS replaces truncated
                # single scattering with the exact-phase one; IMS (below, for
                # downward directions) removes the over-counted secondary
                # scattering of the delta-M spike
                ones = jnp.ones((pr["L"], 1, Bflat), dtype)
                g_uns = jnp.concatenate([ones, pr["pmom"]], axis=1)
                g_scl = jnp.concatenate([ones, pr["pmom_s"]], axis=1)
                at_scaled = ([(il, x_s) for (il, x_s, _, _) in tau_sel]
                             if user_tau else None)
                at_unscaled = ([(il, x_u, t) for (il, _, x_u, t) in tau_sel]
                               if user_tau else None)
                corr_mu = []
                for mu_u in user_mu:
                    # exact at user taus when usrtau is set ((L+1,B) at
                    # levels otherwise) — same closed forms as the radiances
                    corr_v = _intensity.tms_correction(
                        float(mu_u), float(phi), g_uns, g_scl,
                        pr["ssa"], pr["ssa_s"], pr["f_dm"], self.nstr,
                        taucum_s, fbeam, umu0, phi0,
                        beam_top=beam_top, mu_beam=mu_beam,
                        at_taus=at_scaled)
                    if mu_u < 0:
                        # IMS secondary-scattering correction (DISORT INTCOR
                        # applies it alongside TMS for downward directions).
                        # IMS stays plane-parallel even under spher: its
                        # double-scattering depth kernel has no closed
                        # Chapman form, and cdisort likewise never combines
                        # spher with intensity corrections.
                        corr_v = corr_v - _intensity.ims_correction(
                            float(mu_u), float(phi), g_uns,
                            pr["ssa"], pr["f_dm"], pr["tau"], pr["taucum_u"],
                            self.nstr, fbeam, umu0, phi0,
                            at_taus=at_unscaled)
                    corr_mu.append(corr_v)              # (L+1 or T, B)
                corr = jnp.stack(corr_mu, axis=0)       # (numu, ntau, B)
                acc = acc + corr
            uu_phi.append(acc)                          # (numu, ntau, B)
        uu = jnp.stack(uu_phi, axis=0)                  # (nphi, numu, ntau, B)
        uu = jnp.transpose(uu, (3, 2, 0, 1))            # (B, ntau, nphi, numu)
        uu = uu.reshape(nwave, ncol, ntau, len(user_phi), numu)

        uum_out = jnp.transpose(uum_t, (0, 3, 2, 1)).reshape(
            nmode, nwave, ncol, ntau, numu)

        self._stash("_rad", uu)
        self._maybe_print(pr, flux)
        if "print-intensity" in self._flags:
            import jax

            if not any(isinstance(x, jax.core.Tracer)
                       for x in jax.tree_util.tree_leaves(uu)):
                hdr = self.options.header or "DISORT"
                u0 = np.asarray(uu)[0, 0]        # (ntau, nphi, numu)
                print(f"\n{hdr}: intensities (wave 0, col 0); "
                      f"umu={tuple(user_mu)} phi={tuple(user_phi)}")
                for it in range(u0.shape[0]):
                    for ip in range(u0.shape[1]):
                        vals = " ".join(f"{v:12.5e}" for v in u0[it, ip])
                        print(f" tau[{it}] phi[{ip}]: {vals}")
        return dict(flux=flux, uu=uu, uum=uum_out,
                    user_mu=tuple(user_mu), user_phi=tuple(user_phi))

    def albedo_transmissivity(self, prop, albedo=0.0):
        """Albedo and transmissivity of the entire medium (DISORT's IBCND=1).

        cdisort's special mode (``ibcnd`` flag, SURVEY.md section 2.1)
        returns the plane albedo ``albmed(mu)`` and total transmissivity
        ``trnmed(mu)`` of the whole atmosphere for a unit beam incident at
        each ``options.user_mu`` angle (all > 0), considering only
        ``dtauc/ssalb/pmom/nstr/umu/albedo``.

        TPU-native formulation: one batched solve with unit isotropic
        illumination from the top (``fisot = 1``), then van de Hulst
        reciprocity — the upwelling TOA radiance at angle mu under isotropic
        unit illumination equals the plane albedo for a beam incident at mu,
        and the downwelling bottom radiance equals the diffuse beam
        transmissivity; the direct term ``exp(-tau_total / mu)`` completes
        ``trnmed``.  (cdisort's c_albtrans uses the same reciprocity.)

        Returns dict(albmed, trnmed): each ``(nwave, ncol, numu)``.
        """
        user_mu = [float(m) for m in self.options.user_mu]
        if not user_mu or any(m <= 0 for m in user_mu):
            raise ValueError("ibcnd mode requires user_mu angles > 0")
        nwave, ncol = prop.shape[0], prop.shape[1]
        dtype = prop.dtype

        bc = dict(fisot=jnp.ones((nwave, ncol), dtype),
                  albedo=jnp.broadcast_to(jnp.asarray(albedo, dtype),
                                          (nwave, ncol)))
        both_mu = tuple(user_mu) + tuple(-m for m in user_mu)
        # same solver configuration, radiances at +-mu; a fresh instance
        # (not a temporary mutation of self.options) keeps this re-entrant
        # and safe under concurrent use of one Disort object
        flags = " ".join(sorted(self._flags - {"ibcnd"}))
        alt = Disort(dataclasses.replace(
            self.options, flags=flags, user_mu=both_mu, user_phi=(0.0,),
            user_tau=()))
        out = alt.intensities(prop, bc)

        nmu = len(user_mu)
        uu = out["uu"]                       # (nwave, ncol, L+1, 1, 2*nmu)
        albmed = uu[:, :, 0, 0, :nmu]        # upward radiance at TOA
        # downward radiance at the bottom: the unit isotropic top boundary
        # radiance enters the sweep as boundary intensity, so its unscattered
        # (direct) transmission e^{-tau/mu} is already included — TOTAL
        # transmissivity, like DISORT's TRNMED
        trnmed = uu[:, :, -1, 0, nmu:]
        if "print-transmissivity" in self._flags:
            import jax

            if not any(isinstance(x, jax.core.Tracer)
                       for x in jax.tree_util.tree_leaves(trnmed)):
                hdr = self.options.header or "DISORT"
                print(f"\n{hdr}: albedo/transmissivity (wave 0, col 0)")
                print("     mu      albmed      trnmed")
                a0 = np.asarray(albmed)[0, 0]
                t0 = np.asarray(trnmed)[0, 0]
                for i, mu in enumerate(user_mu):
                    print(f"{mu:8.4f} {a0[i]:11.5e} {t0[i]:11.5e}")
        return dict(albmed=albmed, trnmed=trnmed)

    def gather_rad(self):
        """Radiances from the last :meth:`intensities` call (pydisort's
        ``get_rad`` equivalent).  Eager-only: a call under jit/vmap does
        not retain results — capture ``intensities()``'s return instead."""
        if self._rad is Disort._TRACED:
            raise RuntimeError(
                "the last intensities() ran under jit/vmap; traced results "
                "are not retained — use the dict intensities() returns")
        if self._rad is None:
            raise RuntimeError("call intensities() first")
        return self._rad

    # convenience accessors matching pydisort's API surface -----------------

    def fluxes(self):
        """Last-forward flux components (flup, rfldn, rfldir), top-down.

        Eager-only, like :meth:`gather_rad`."""
        if self._last is Disort._TRACED:
            raise RuntimeError(
                "the last forward() ran under jit/vmap; traced results are "
                "not retained — use the flux array forward() returns")
        if self._last is Disort._BYPASSED:
            raise RuntimeError(
                "the last run went through Radiation.forward(fuse_bands="
                "True), which bypasses this band's solver; read the fused "
                "fluxes from Radiation.forward's return value")
        if self._last is None:
            raise RuntimeError("call forward() first")
        return self._last["flup"], self._last["rfldn"], self._last["rfldir"]
