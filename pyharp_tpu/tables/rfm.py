"""RFM (Reference Forward Model) k-table ingestion.

The reference reads NetCDF4 k-tables through the NetCDF C API at module
construction (``/root/reference/src/opacity/rfm.cpp:34-114``) with schema:

* dims: ``Wavenumber`` x ``Pressure`` x ``TempGrid``
* vars: ``Wavenumber`` (cm^-1), ``Pressure`` (Pa, converted to ln-Pressure),
  ``TempGrid`` (temperature-anomaly grid, K), ``Temperature`` (reference
  T(p) profile, length nPressure), one variable per species name with shape
  ``(nWavenumber, nPressure, nTempGrid)`` holding ``ln k [m^2/kmol]``, and a
  ``weights`` variable of correlated-k quadrature weights
  (``src/utils/read_weights.cpp:18-47``).

TPU-native design: ingestion is pure host-side numpy (NetCDF4 files are HDF5
containers read via h5py; classic NetCDF3 falls back to scipy).  Tables land
on device once as pytree leaves; no IO library appears anywhere near the
jitted path.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .resource import find_resource


@dataclasses.dataclass(frozen=True)
class RFMTable:
    """Host-side image of one RFM k-table."""

    wavenumber: np.ndarray  # (nwave,) cm^-1
    lnp: np.ndarray         # (npres,) ln(Pa), ascending
    tempgrid: np.ndarray    # (ntemp,) K anomaly, ascending
    reftemp: np.ndarray     # (npres,) reference T on the lnp grid
    kdata: np.ndarray       # (nwave, npres, ntemp) ln k [m^2/kmol]
    weights: np.ndarray | None  # (nwave,) ck quadrature weights, if present


def _open_any(path: str):
    """Yield a dict-like {name: np.ndarray} view of a NetCDF4/HDF5 or NetCDF3 file."""
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic[:3] == b"CDF":  # classic NetCDF3
        from scipy.io import netcdf_file

        nc = netcdf_file(path, "r", mmap=False)
        return {k: np.array(v[:]) for k, v in nc.variables.items()}
    import h5py

    out = {}
    with h5py.File(path, "r") as f:
        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                out[name.split("/")[-1]] = np.array(obj[...])
        f.visititems(visit)
    return out


def load_rfm_table(filename: str, species: str) -> RFMTable:
    """Load one species' k-table, normalizing axes to ascending order.

    The reference interpolates with a monotonic-either-way ``locate``; we
    instead flip any descending axis once here so device code only ever sees
    ascending axes (see ``pyharp_tpu.interp.interpn``).
    """
    path = find_resource(filename)
    v = _open_any(path)
    for key in ("Wavenumber", "Pressure", "TempGrid", "Temperature"):
        if key not in v:
            raise KeyError(f"{path}: missing variable {key!r}")
    if species not in v:
        raise KeyError(f"{path}: missing species variable {species!r}")

    wave = np.asarray(v["Wavenumber"], np.float64)
    pres = np.asarray(v["Pressure"], np.float64)
    tgrid = np.asarray(v["TempGrid"], np.float64)
    reftemp = np.asarray(v["Temperature"], np.float64)
    kdata = np.asarray(v[species], np.float64)
    if kdata.shape != (wave.size, pres.size, tgrid.size):
        raise ValueError(
            f"{path}: {species} shape {kdata.shape} != "
            f"{(wave.size, pres.size, tgrid.size)}"
        )

    lnp = np.log(pres)  # rfm.cpp:77 ln-pressure axis

    # flip axes to ascending (wave axis 0, lnp axis 1, tempgrid axis 2)
    if wave.size > 1 and wave[0] > wave[-1]:
        wave = wave[::-1].copy()
        kdata = kdata[::-1].copy()
    if lnp.size > 1 and lnp[0] > lnp[-1]:
        lnp = lnp[::-1].copy()
        reftemp = reftemp[::-1].copy()
        kdata = kdata[:, ::-1].copy()
    if tgrid.size > 1 and tgrid[0] > tgrid[-1]:
        tgrid = tgrid[::-1].copy()
        kdata = kdata[:, :, ::-1].copy()

    weights = None
    if "weights" in v:
        weights = np.asarray(v["weights"], np.float64)

    return RFMTable(wave, lnp, tgrid, reftemp, kdata, weights)


def read_weights_rfm(filename: str) -> np.ndarray:
    """Read correlated-k quadrature weights.

    Parity with ``/root/reference/src/utils/read_weights.cpp:18-47``.
    """
    path = find_resource(filename)
    v = _open_any(path)
    if "weights" not in v:
        raise KeyError(f"{path}: missing variable 'weights'")
    return np.asarray(v["weights"], np.float64)


def write_rfm_table(
    filename: str,
    wavenumber: np.ndarray,
    pressure: np.ndarray,
    tempgrid: np.ndarray,
    reftemp: np.ndarray,
    species: dict[str, np.ndarray],
    weights: np.ndarray | None = None,
) -> None:
    """Write a k-table in the RFM schema (HDF5/NetCDF4 container).

    Used to synthesize test fixtures: the reference repo gitignores its real
    ``amarsw-ck-*.nc`` tables (``/root/reference/.gitignore``), so this build
    generates schema-exact synthetic tables instead.
    """
    import h5py

    with h5py.File(filename, "w") as f:
        f.create_dataset("Wavenumber", data=np.asarray(wavenumber, np.float64))
        f.create_dataset("Pressure", data=np.asarray(pressure, np.float64))
        f.create_dataset("TempGrid", data=np.asarray(tempgrid, np.float64))
        f.create_dataset("Temperature", data=np.asarray(reftemp, np.float64))
        for name, k in species.items():
            f.create_dataset(name, data=np.asarray(k, np.float64))
        if weights is not None:
            f.create_dataset("weights", data=np.asarray(weights, np.float64))
