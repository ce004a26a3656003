"""YAML band factory.

Parity with the reference's band-configuration schema
(``/root/reference/examples/amarsw-ck.yaml``, legacy parser
``src/radiation/radiation_bands_factory.cpp_:16-51``):

* ``opacity-sources``: list of {name, class, data, dependent-species};
* ``bands``: list of band names, each with a top-level node holding
  ``units``, ``grid-type`` (``regular`` | ``cktable``), ``wavenumber-range``,
  ``resolution`` (regular grids), ``opacity`` (source-name list),
  ``rt-solver`` and ``flags``;
* ``Disort-flags``: global bool map translated to the solver flag string.

Opacity ``class`` strings map onto this build's attenuators; the legacy
factory's full intended class set (``absorber_factory.cpp_:81-118``) is
registered here, with table-backed classes sharing the RFM ingestion path
and data-unavailable classes raising with a clear message.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import yaml

from ..opacity.base import AttenuatorOptions
from ..rt.disort.disort import DisortOptions
from ..tables.rfm import load_rfm_table, read_weights_rfm
from .band import RadiationBandOptions
from .radiation import RadiationOptions

# class string -> attenuator type in this build
_CLASS_MAP = {
    "Hitran": "rfm",          # line-by-line RFM-schema table
    "HitranCK": "rfm",        # correlated-k RFM-schema table
    "HeliosCK": "rfm",
    "RFM": "rfm",
    "S8Fuller": "s8_fuller",
    "H2SO4Simple": "h2so4_simple",
    "XIZ-H2-H2-CIA": "h2_h2_cia",
    "XIZ-H2-He-CIA": "h2_he_cia",
    "SimpleCloud": "simple_cloud",
    "Grey": "grey",
    # Legacy CANOE classes (absorber_factory.cpp_:81-139), implemented
    # natively in opacity/freedman.py and opacity/radio.py
    "FreedmanSimple": "freedman_simple",
    "FreedmanSimple2": "freedman_simple",
    "FreedmanMean": "freedman_mean",
    "FreedmanMean2": "freedman_mean",
    "radio-NH3": "radio_nh3",
    "radio-H2O": "radio_h2o",
    "radio-H2S": "radio_h2s",
    "radio-PH3": "radio_ph3",
    "radio-CIA": "radio_cia",
    "radio-Electron": "radio_electron",
}

_BAND_FLAG_MAP = {
    "thermal_emission": "planck",
}


def _disort_flag_string(flag_map: dict[str, bool] | None) -> str:
    if not flag_map:
        return "lamber,quiet,onlyfl"
    toks = [k for k, v in flag_map.items() if v]
    return ",".join(toks)


def create_radiation_options(
    config: str | dict,
    species: dict[str, tuple[int, float]],
    nlyr: int,
    ncol: int = 1,
    nstr: int = 8,
) -> RadiationOptions:
    """Build RadiationOptions from a YAML file path/string or parsed dict.

    Args:
      species: map species-name -> (species_id, molecular weight kg/mol);
        plays the role of the host model's species registry that the legacy
        factory consulted.
    """
    if isinstance(config, str):
        try:
            with open(config) as f:
                node = yaml.safe_load(f)
        except FileNotFoundError:
            node = yaml.safe_load(config)
    else:
        node = config

    sources = {}
    for src in node.get("opacity-sources", []):
        sources.setdefault(src["name"], []).append(src)

    names = sorted(species, key=lambda n: species[n][0])
    species_names = tuple(names)
    species_weights = tuple(species[n][1] for n in names)

    dis_flags = _disort_flag_string(node.get("Disort-flags"))

    band_names = tuple(node.get("bands", ()))
    band_opts = []
    for bname in band_names:
        b = node[bname]
        wmin, wmax = b.get("wavenumber-range", (0.0, 0.0))
        grid_type = b.get("grid-type", "regular")

        attenuators = []
        ck_weights: tuple[float, ...] = ()
        nwave = None
        wave_grid: tuple[float, ...] = ()
        if grid_type == "cktable":
            for oname in b.get("opacity", ()):
                cands = sources.get(oname, [])
                # pick the source whose table covers this band, else first
                src = _pick_source(cands, bname)
                atype = _CLASS_MAP.get(src["class"], src["class"])
                sid = species[oname][0] if oname in species else 0
                aop = AttenuatorOptions(
                    type=atype,
                    opacity_files=(src["data"],),
                    species_ids=(sid,),
                    species_names=species_names,
                    species_weights=species_weights,
                )
                attenuators.append((f"{oname}-{bname}", aop))
                if atype == "rfm" and not ck_weights:
                    w = read_weights_rfm(src["data"])
                    ck_weights = tuple(float(x) for x in w)
                    nwave = len(ck_weights)
        else:  # regular grid
            res = float(b.get("resolution", 1.0))
            if res <= 0.0 or res > (wmax - wmin):
                # res > span would invert the clipped outer bin edges
                # (wave_lower > wave_upper -> negative bin widths)
                raise ValueError(
                    f"band {bname}: resolution {res} must be in (0, "
                    f"{wmax - wmin}] (the wavenumber-range span)")
            nwave = max(int(round((wmax - wmin) / res)) + 1, 2)
            # sample points wmin + i*res (reference `resolution` semantics,
            # amarsw-lbl.yaml); each sample owns a bin of width `res`
            # centered on it, so the per-bin edges SUBDIVIDE the band:
            # Planck emission per bin is the sub-bin share, and the band
            # integral is the rectangle rule sum(width_i * F_i) — matching
            # the hand integration in examples/amars_sw.py (reference
            # amars_sw.cpp:174-196).
            wave_grid = tuple(wmin + i * res for i in range(nwave))
            for oname in b.get("opacity", ()):
                src = _pick_source(sources.get(oname, []), bname)
                atype = _CLASS_MAP.get(src["class"], src["class"])
                sid = species[oname][0] if oname in species else 0
                aop = AttenuatorOptions(
                    type=atype,
                    opacity_files=(src["data"],),
                    species_ids=(sid,),
                    species_names=species_names,
                    species_weights=species_weights,
                )
                attenuators.append((f"{oname}-{bname}", aop))

        flags = dis_flags
        for fl in b.get("flags", ()):
            mapped = _BAND_FLAG_MAP.get(fl, fl)
            if mapped not in flags:
                flags = flags + "," + mapped

        solver = b.get("rt-solver", "Disort").lower()
        if solver == "disort":
            solver_name = "disort"
        elif solver in ("beerlambert", "beer_lambert", "beer-lambert"):
            solver_name = "beer_lambert"
        else:
            raise ValueError(f"Unknown rt-solver: {b.get('rt-solver')}")

        nw = nwave or 1
        if wave_grid:
            # regular grid: per-bin edges subdivide [wmin, wmax]; the
            # outermost bins are CLIPPED to the band range (half width), so
            # the bins tile exactly [wmin, wmax] — Planck sub-band
            # integrals sum to the full band integral, and adjacent bands
            # sharing a boundary do not double-count the seam interval.
            # Width-weighted beam integration thereby becomes the
            # trapezoid rule (half weights at the end samples).
            wave_lower = tuple(max(w - res / 2, wmin) for w in wave_grid)
            wave_upper = tuple(min(w + res / 2, wmax) for w in wave_grid)
        else:
            # cktable: every g-point represents the WHOLE band (weights sum
            # to 1), so each bin carries the full band edges — matching the
            # reference LW driver (amars_lw.cpp:18-38 disort_options_lw)
            wave_lower = (float(wmin),) * nw
            wave_upper = (float(wmax),) * nw
        band_opts.append(RadiationBandOptions(
            name=bname,
            solver_name=solver_name,
            nlyr=nlyr,
            ncol=ncol,
            wave_lower=wave_lower,
            wave_upper=wave_upper,
            wavenumber=wave_grid,
            attenuators=tuple(attenuators),
            disort=DisortOptions(flags=flags, nstr=nstr, nmom=nstr,
                                 nwave=nw, ncol=ncol, nlyr=nlyr),
            ck_weights=ck_weights,
        ))

    return RadiationOptions(bands=band_names, band_options=tuple(band_opts))


def _pick_source(cands: list[dict], bname: str) -> dict:
    """Pick the opacity source entry for band ``bname``.

    Selection is explicit-first (legacy parser:
    ``radiation_bands_factory.cpp_:16-51`` had one source per name; this
    build allows one entry per band under a shared name):

    1. if any candidate carries an explicit ``band:`` key, only an exact
       match is accepted — ambiguity or no match raises;
    2. a single candidate wins outright;
    3. otherwise the band name must appear in EXACTLY one candidate's
       ``data`` filename — zero or several matches raise with a pointer to
       the explicit ``band:`` key (a silent wrong pick is never possible).
    """
    if not cands:
        raise ValueError(f"band {bname}: no opacity source found")
    tagged = [c for c in cands if "band" in c]
    if tagged:
        hits = [c for c in tagged if str(c["band"]) == bname]
        if len(hits) == 1:
            return hits[0]
        raise ValueError(
            f"band {bname}: {len(hits)} opacity sources declare "
            f"band: {bname!r} (need exactly 1); declared bands: "
            f"{[str(c.get('band')) for c in cands]}")
    if len(cands) == 1:
        return cands[0]
    hits = [c for c in cands
            if bname.lower() in str(c.get("data", "")).lower()]
    if len(hits) == 1:
        return hits[0]
    datas = [str(c.get("data", "")) for c in cands]
    raise ValueError(
        f"band {bname}: ambiguous opacity source — {len(cands)} candidates "
        f"share the name and {len(hits)} of their data filenames contain "
        f"{bname!r} ({datas}); disambiguate with an explicit 'band: "
        f"{bname}' key on the intended opacity-sources entry")
