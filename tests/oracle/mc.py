"""ctypes wrapper for the compiled Monte Carlo oracle (csrc/mc_oracle.c).

The BASELINE acceptance names "flux RMSE vs cdisort" as the validation
artifact; cdisort's source is absent from the reference checkout (fetched
at configure time from the external pydisort repo) and this environment
has no network, so the compiled third-party-class reference is this C
Monte Carlo photon transport — an algorithm with nothing in common with
the discrete-ordinates solver under test (no quadrature, no Fourier
modes, no eigenproblem), whose only error is the ~1/sqrt(n) statistical
one.  See RMSE.md for the recorded comparison matrix.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_CSRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc")
_SRC = os.path.join(_CSRC, "mc_oracle.c")
_SO = os.path.join(_CSRC, "build", "libmc_oracle.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    stale = (not os.path.exists(_SO)
             or os.path.getmtime(_SRC) > os.path.getmtime(_SO))
    if stale:
        os.makedirs(os.path.dirname(_SO), exist_ok=True)
        subprocess.run(["gcc", "-O3", "-fPIC", "-std=c11", "-shared",
                        "-o", _SO, _SRC, "-lm"],
                       check=True, capture_output=True, timeout=120)
    lib = ctypes.CDLL(_SO)
    pd = ctypes.POINTER(ctypes.c_double)
    lib.mc_beam.argtypes = [ctypes.c_int, pd, pd, pd, ctypes.c_double,
                            ctypes.c_double, ctypes.c_long,
                            ctypes.c_uint64, pd, pd]
    lib.mc_isotropic_top.argtypes = [ctypes.c_int, pd, pd, pd,
                                     ctypes.c_double, ctypes.c_long,
                                     ctypes.c_uint64, pd, pd]
    lib.mc_thermal.argtypes = [ctypes.c_int, pd, pd, pd, ctypes.c_double,
                               pd, ctypes.c_double, ctypes.c_long,
                               ctypes.c_uint64, pd, pd]
    _lib = lib
    return lib


def _prep(dtau, ssa, g):
    dtau = np.ascontiguousarray(dtau, np.float64)
    nlyr = dtau.shape[0]
    ssa = np.ascontiguousarray(np.broadcast_to(ssa, (nlyr,)), np.float64)
    g = np.ascontiguousarray(np.broadcast_to(g, (nlyr,)), np.float64)
    return nlyr, dtau, ssa, g


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def mc_beam_flux(dtau, ssa, g, albedo, mu0, fbeam=1.0,
                 n_photons=2_000_000, seed=1):
    """(flup, fldn_total) at levels 0..nlyr (top-down), beam source.

    Fluxes are normalized to an incident beam flux ``mu0 * fbeam`` through
    the TOA (DISORT's convention for FBEAM = beam intensity fbeam).
    """
    lib = _load()
    nlyr, dtau, ssa, g = _prep(dtau, ssa, g)
    up = np.zeros(nlyr + 1)
    dn = np.zeros(nlyr + 1)
    lib.mc_beam(nlyr, _ptr(dtau), _ptr(ssa), _ptr(g),
                float(albedo), float(mu0), int(n_photons), int(seed),
                _ptr(up), _ptr(dn))
    scale = float(mu0) * float(fbeam)
    return up * scale, dn * scale


def mc_isotropic_flux(dtau, ssa, g, albedo, fisot=1.0,
                      n_photons=2_000_000, seed=1):
    """(flup, fldn) at levels, isotropic TOA illumination of intensity
    ``fisot`` (incident downward flux = pi * fisot)."""
    lib = _load()
    nlyr, dtau, ssa, g = _prep(dtau, ssa, g)
    up = np.zeros(nlyr + 1)
    dn = np.zeros(nlyr + 1)
    lib.mc_isotropic_top(nlyr, _ptr(dtau), _ptr(ssa), _ptr(g),
                         float(albedo), int(n_photons), int(seed),
                         _ptr(up), _ptr(dn))
    scale = np.pi * float(fisot)
    return up * scale, dn * scale


def mc_thermal_flux(dtau, ssa, g, albedo, blev, bsurf,
                    n_photons=2_000_000, seed=1):
    """(flup, fldn) at levels for internal thermal emission.

    ``blev``: Planck function at the nlyr+1 levels (linear in tau within
    each layer — the same source model as the solver), ``bsurf``: surface
    Planck; surface emissivity = 1 - albedo.
    """
    lib = _load()
    nlyr, dtau, ssa, g = _prep(dtau, ssa, g)
    blev = np.ascontiguousarray(blev, np.float64)
    assert blev.shape == (nlyr + 1,)
    up = np.zeros(nlyr + 1)
    dn = np.zeros(nlyr + 1)
    lib.mc_thermal(nlyr, _ptr(dtau), _ptr(ssa), _ptr(g),
                   float(albedo), _ptr(blev), float(bsurf),
                   int(n_photons), int(seed), _ptr(up), _ptr(dn))
    return up, dn
