"""ASCII table ingestion (host side, never traced).

Parity with the reference file IO helpers
(``/root/reference/src/utils/fileio.cpp:28-133``): comment stripping,
column/row counting, and column-mapped data reading.  The hot path
(``read_data_table``) uses the native C++ parser from ``csrc/`` when the
library is available, with this module's numpy implementation as fallback.
"""

from __future__ import annotations

import io

import numpy as np

from .. import _native
from .resource import find_resource


def decomment_file(path: str, comment: str = "#") -> str:
    """Strip ``#`` comments; parity with ``fileio.cpp`` ``decomment_file``."""
    out = []
    with open(path) as f:
        for line in f:
            i = line.find(comment)
            if i >= 0:
                line = line[:i] + "\n"
            out.append(line)
    return "".join(out)


def read_data_table(name: str) -> np.ndarray:
    """Read a whitespace-separated numeric table, comments stripped.

    Returns float64 array of shape (rows, cols).
    """
    path = find_resource(name)
    if _native.available():
        return _native.read_table(path)
    text = decomment_file(path)
    data = np.loadtxt(io.StringIO(text), dtype=np.float64, ndmin=2)
    if data.size == 0:
        raise ValueError(f"Empty file: {path}")
    return data


def get_num_cols(name: str) -> int:
    return read_data_table(name).shape[1]


def get_num_rows(name: str) -> int:
    return read_data_table(name).shape[0]


def read_data_vector(name: str) -> dict[str, np.ndarray]:
    """Header-row -> column map; parity with ``read_data_vector``.

    The first commented line is interpreted as column names.
    """
    path = find_resource(name)
    with open(path) as f:
        first = f.readline()
    names = first.lstrip("#").split()
    data = read_data_table(name)
    if len(names) != data.shape[1]:
        names = [f"col{i}" for i in range(data.shape[1])]
    return {n: data[:, i] for i, n in enumerate(names)}


def read_aerosol_profile(name: str) -> np.ndarray:
    """Read the 4-column aMars aerosol profile (p[bar], T, SO4AER, S8AER).

    Parity with ``read_4width_array_from_file``
    (``/root/reference/examples/amars_sw.cpp:104-127``): the first line is a
    header; rows without exactly 4 values are skipped.
    """
    path = find_resource(name)
    rows = []
    with open(path) as f:
        f.readline()  # skip header line
        for line in f:
            vals = line.split()
            if len(vals) == 4:
                try:
                    rows.append([float(v) for v in vals])
                except ValueError:
                    pass
    return np.asarray(rows, dtype=np.float64)


def read_stellar_flux(flux_file: str, wave_file: str) -> tuple[np.ndarray, np.ndarray]:
    """Read paired stellar flux / wavelength text files.

    Parity with ``/root/reference/src/utils/read_stellar_flux.cpp:6-34``.
    Returns (flux, wavelength) float64 arrays.
    """
    flux = read_data_table(flux_file).ravel()
    wave = read_data_table(wave_file).ravel()
    if flux.shape != wave.shape:
        raise ValueError(
            f"flux ({flux.shape}) and wavelength ({wave.shape}) sizes differ"
        )
    return flux, wave
