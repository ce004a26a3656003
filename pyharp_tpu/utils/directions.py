"""Radiation direction parsing and direction grids.

Parity with ``/root/reference/src/utils/parse_radiation_direction.cpp:10-31``
(string ``"(mu_deg, phi_deg)"`` -> ``(mu = cos(theta), phi_rad)``) and
``src/utils/get_direction_grids.hpp:18-48`` (dedup into sorted unique
phi/mu grids with 1e-3 tolerance).  Host-side, never traced.
"""

from __future__ import annotations

import math
import re

import numpy as np


def deg2rad(x: float) -> float:
    return x * math.pi / 180.0


def parse_radiation_direction(s: str) -> np.ndarray:
    """``"(mu_deg, phi_deg)"`` -> array [cos(mu_deg), phi_rad]."""
    m = re.match(r"\s*\(\s*([-\d.eE+]+)\s*,\s*([-\d.eE+]+)\s*\)", s)
    if not m:
        raise ValueError(f"cannot parse radiation direction: {s!r}")
    mu = math.cos(deg2rad(float(m.group(1))))
    phi = deg2rad(float(m.group(2)))
    return np.array([mu, phi], dtype=np.float64)


def parse_radiation_directions(s: str) -> np.ndarray:
    """Whitespace/comma-separated list of direction strings -> (nray, 2)."""
    tokens = re.findall(r"\([^)]*\)", s)
    if not tokens:
        return np.zeros((0, 2))
    return np.stack([parse_radiation_direction(t) for t in tokens])


def get_direction_grids(dirs: np.ndarray, tol: float = 1.0e-3):
    """Unique sorted (uphi, umu) grids from (nray, 2) [mu, phi] rows.

    Note the reference reads column 0 as phi and column 1 as mu at this point
    (``get_direction_grids.hpp:26-41``) even though the parser packs
    [mu, phi]; we follow the parser convention (col 0 = mu, col 1 = phi) and
    document the divergence — the reference's two utilities disagree with
    each other (SURVEY.md section 7, layout quirks).
    """
    def uniq(vals):
        out: list[float] = []
        for v in vals:
            if not any(abs(v - u) <= tol for u in out):
                out.append(float(v))
        return sorted(out)

    if dirs.size == 0:
        return [], []
    umu = uniq(dirs[:, 0])
    uphi = uniq(dirs[:, 1])
    return uphi, umu
