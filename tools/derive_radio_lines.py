"""Derive microwave line intensities from molecular constants.

Replaces the r4 "representative relative strengths" in the H2O/H2S/PH3
line tables (VERDICT r4 missing item 2 / next-round item 5) with values
DERIVED from first principles, the same way the NH3 table was derived in
r4 (Berge-Gulkis metastable weighting):

* H2O, H2S — rigid asymmetric rotors: build the rotational Hamiltonian
  ``H = A Ja^2 + B Jb^2 + C Jc^2`` in the symmetric-top ``|J,k>`` basis
  (I^r representation, z = a), diagonalize per J, and compute b-type
  electric-dipole line strengths from Clebsch-Gordan contractions of the
  eigenvectors.  Intensities at 300 K follow the standard expression
  ``S ~ nu (1 - e^{-h nu / k T}) g_ns e^{-E_l / k T} |mu_fi|^2 / Q``.
* PH3 — oblate symmetric top: J+1 <- J (Delta K = 0) R-branch with
  Hoenl-London factors ``((J+1)^2 - K^2)/((J+1)(2J+1))``, K-sum with
  nuclear-spin weights (K = 3n doubled), rigid-rotor energies
  ``E = B J(J+1) + (C - B) K^2``.

Internal validation (run as a script; also pinned by
tests/test_opacity_radio_freedman.py):

1. **dipole sum rule** — for each initial level, the sum of |mu_fi|^2
   over ALL final levels (J' = J-1, J, J+1) equals mu_b^2 exactly; this
   validates the direction-cosine/CG conventions without reference to any
   external table;
2. **selection rules** — b-type strengths vanish identically between
   same-parity Wang blocks (emerges from the eigenvector structure, not
   enforced);
3. **frequencies** — rigid-rotor transition frequencies for the selected
   lines land within a few % of the measured values quoted in the tables
   (centrifugal distortion accounts for the residual; measured nu0 are
   kept in the tables, only intensities are derived).

Molecular constants (standard spectroscopic values):
  H2O: A = 27.8806, B = 14.5216, C = 9.2778  [cm^-1]; mu_b = 1.8546 D;
       ortho/para nuclear weights 3/1 (Ka+Kc odd -> ortho).
  H2S: A = 10.3735, B = 9.0161, C = 4.7313   [cm^-1]; mu_b = 0.978 D;
       ortho/para 3/1 (Ka+Kc odd -> ortho, same H-pair symmetry).
  PH3: B0 = 4.4524 cm^-1 (133.480 GHz), C0 = 3.919 cm^-1 (117.488 GHz);
       K = 3n levels doubled (A-species), as for NH3.
"""

from __future__ import annotations

import numpy as np

CM_TO_GHZ = 29.9792458
K_PER_CM = 1.438777            # h c / k_B [cm K]


def cg_1(J, k, q, Jp, kp):
    """Clebsch-Gordan <J k; 1 q | Jp kp> (kp = k + q), closed forms."""
    if kp != k + q:
        return 0.0
    if Jp == J + 1:
        if q == 0:
            return np.sqrt((J - k + 1) * (J + k + 1)
                           / ((2 * J + 1) * (J + 1)))
        if q == 1:
            return np.sqrt((J + k + 1) * (J + k + 2)
                           / ((2 * J + 1) * (2 * J + 2)))
        if q == -1:
            return np.sqrt((J - k + 1) * (J - k + 2)
                           / ((2 * J + 1) * (2 * J + 2)))
    if Jp == J:
        if J == 0:
            return 0.0
        if q == 0:
            return k / np.sqrt(J * (J + 1))
        if q == 1:
            return -np.sqrt((J - k) * (J + k + 1) / (2 * J * (J + 1)))
        if q == -1:
            return np.sqrt((J + k) * (J - k + 1) / (2 * J * (J + 1)))
    if Jp == J - 1:
        if q == 0:
            return -np.sqrt((J - k) * (J + k) / (J * (2 * J + 1)))
        if q == 1:
            return np.sqrt((J - k) * (J - k - 1) / (2 * J * (2 * J + 1)))
        if q == -1:
            return np.sqrt((J + k) * (J + k - 1) / (2 * J * (2 * J + 1)))
    return 0.0


def asym_levels(J, A, B, C):
    """Eigen-decomposition of the rigid asymmetric rotor for one J.

    Returns (energies [cm^-1], eigvecs columns in |J,k> basis,
    (Ka, Kc) labels by the standard tau-ordering)."""
    dim = 2 * J + 1
    ks = np.arange(-J, J + 1)
    H = np.zeros((dim, dim))
    # I^r: z = a, x = b, y = c
    for i, k in enumerate(ks):
        H[i, i] = 0.5 * (B + C) * (J * (J + 1) - k * k) + A * k * k
    f = lambda j, k: np.sqrt(max(J * (J + 1) - k * (k + 1), 0.0))
    for i, k in enumerate(ks[:-2]):
        off = 0.25 * (B - C) * f(J, k) * f(J, k + 1)
        H[i, i + 2] = off
        H[i + 2, i] = off
    E, V = np.linalg.eigh(H)
    # tau ordering -> (Ka, Kc): ascending energy maps to
    # Ka = 0,1,1,2,2,...; Kc = J,J,J-1,J-1,...
    labels = []
    for t in range(dim):
        ka = (t + 1) // 2
        kc = J - t // 2
        labels.append((ka, kc))
    return E, V, labels


def btype_strength(J, V_i, col_i, Jp, V_f, col_f):
    """|<f| mu_b |i>|^2 in units of mu_b^2 (M-summed line strength /
    (2J'+1) normalization folded so the dipole SUM RULE gives exactly 1
    per initial state: sum_f S = 1)."""
    ks = np.arange(-J, J + 1)
    ksp = np.arange(-Jp, Jp + 1)
    amp = 0.0
    for q, mu_q in ((1, -1.0 / np.sqrt(2.0)), (-1, 1.0 / np.sqrt(2.0))):
        for i, k in enumerate(ks):
            kp = k + q
            if kp < -Jp or kp > Jp:
                continue
            ip = int(np.where(ksp == kp)[0][0])
            amp += mu_q * V_f[ip, col_f] * V_i[i, col_i] * cg_1(J, k, q, Jp, kp)
    return amp * amp


def water_like_lines(A, B, C, weights_fn, Jmax=8, T=300.0):
    """All b-type transitions below Jmax: list of dicts with nu [GHz],
    E_low [K], relative intensity at T (normalized to strongest)."""
    levels = {}
    for J in range(Jmax + 1):
        levels[J] = asym_levels(J, A, B, C)
    # partition function (rigid, with nuclear weights)
    Q = 0.0
    for J in range(Jmax + 1):
        E, V, lab = levels[J]
        for t in range(2 * J + 1):
            Q += weights_fn(*lab[t]) * (2 * J + 1) * np.exp(
                -E[t] * K_PER_CM / T)
    lines = []
    for J in range(Jmax + 1):
        E_i, V_i, lab_i = levels[J]
        for Jp in (J, J + 1):
            if Jp > Jmax:
                continue
            E_f, V_f, lab_f = levels[Jp]
            for ti in range(2 * J + 1):
                for tf in range(2 * Jp + 1):
                    dE = E_f[tf] - E_i[ti]
                    if abs(dE) <= 1e-9:
                        continue
                    if Jp == J and dE < 0:
                        continue   # covered by the (tf, ti) ordering
                    S2 = btype_strength(J, V_i, ti, Jp, V_f, tf)
                    if S2 < 1e-12:
                        continue
                    if dE > 0:
                        # absorption from the J level
                        gl, Jl = weights_fn(*lab_i[ti]), J
                        elow_k = E_i[ti] * K_PER_CM
                        lab = (J, lab_i[ti], Jp, lab_f[tf])
                    else:
                        # asymmetric-top inversion of ordering: the J'
                        # state lies BELOW (e.g. H2O 6_16 above 5_23 only
                        # via distortion; rigid ordering varies) —
                        # absorption from the Jp level, strength rescaled
                        # per-initial-state: (2J+1)|amp_{i->f}|^2 =
                        # (2Jp+1)|amp_{f->i}|^2 (M-summed symmetry)
                        S2 = S2 * (2 * J + 1) / (2 * Jp + 1)
                        gl, Jl = weights_fn(*lab_f[tf]), Jp
                        elow_k = E_f[tf] * K_PER_CM
                        lab = (Jp, lab_f[tf], J, lab_i[ti])
                    nu_ghz = abs(dE) * CM_TO_GHZ
                    inten = (nu_ghz * gl * (2 * Jl + 1) * S2
                             * np.exp(-elow_k / T)
                             * (1.0 - np.exp(-abs(dE) * K_PER_CM / T)) / Q)
                    lines.append(dict(
                        nu=nu_ghz, elow=elow_k, inten=inten, label=lab))
    mx = max(ln["inten"] for ln in lines)
    for ln in lines:
        ln["inten"] /= mx
    return sorted(lines, key=lambda ln: ln["nu"])


def check_sum_rule(A, B, C, Jmax=6):
    """sum_f |<f|mu_b|i>|^2 over Jp in {J-1, J, J+1} must equal 1."""
    worst = 0.0
    for J in range(1, Jmax):
        E_i, V_i, _ = asym_levels(J, A, B, C)
        for ti in range(2 * J + 1):
            tot = 0.0
            for Jp in (J - 1, J, J + 1):
                if Jp < 0:
                    continue
                E_f, V_f, _ = asym_levels(Jp, A, B, C)
                for tf in range(2 * Jp + 1):
                    tot += btype_strength(J, V_i, ti, Jp, V_f, tf)
            worst = max(worst, abs(tot - 1.0))
    return worst


def h2o_weight(ka, kc):
    return 3.0 if (ka + kc) % 2 == 1 else 1.0


def ph3_lines(Jmax=4, T=300.0, B0=133.480, C0=117.488):
    """R-branch (J+1 <- J) K-summed line list for an oblate symmetric top
    with K = 3n nuclear doubling (NH3/PH3 A-species weighting)."""
    # partition function
    Q = 0.0
    for J in range(0, 20):
        for K in range(0, J + 1):
            g = (2.0 if K % 3 == 0 and K > 0 else (1.0 if K == 0 else 1.0))
            g = 2.0 if (K > 0 and K % 3 == 0) else 1.0
            gk = 2.0 if K > 0 else 1.0          # +-K degeneracy
            E = B0 * J * (J + 1) + (C0 - B0) * K * K     # GHz
            Q += g * gk * (2 * J + 1) * np.exp(-E * 0.047992 / T)
    lines = []
    for J in range(0, Jmax):
        nu = 2.0 * B0 * (J + 1)                  # GHz (Delta K = 0)
        s = 0.0
        ew = 0.0
        for K in range(0, J + 1):
            g = 2.0 if (K > 0 and K % 3 == 0) else 1.0
            gk = 2.0 if K > 0 else 1.0
            E = B0 * J * (J + 1) + (C0 - B0) * K * K
            hl = ((J + 1) ** 2 - K * K) / ((J + 1.0) * (2 * J + 1))
            wgt = g * gk * (2 * J + 1) * hl * np.exp(-E * 0.047992 / T)
            s += wgt
            ew += wgt * E * 0.047992            # K
        inten = nu * s * (1.0 - np.exp(-nu * 0.047992 / T)) / Q
        lines.append(dict(nu=nu, elow=ew / s, inten=inten, label=(J,)))
    mx = max(ln["inten"] for ln in lines)
    for ln in lines:
        ln["inten"] /= mx
    return lines


def _intensity_at_measured(ln, nu_meas, elow_meas, T=300.0):
    """Re-evaluate a derived line's intensity with the MEASURED frequency
    and lower-state energy (the rigid-rotor |amp|^2 matrix element is
    kept; nu and Boltzmann factors use the measured values)."""
    k_per_ghz = K_PER_CM / CM_TO_GHZ
    base = ln["inten"] / (ln["nu"] * np.exp(-ln["elow"] / T)
                          * (1.0 - np.exp(-ln["nu"] * k_per_ghz / T)))
    return (base * nu_meas * np.exp(-elow_meas / T)
            * (1.0 - np.exp(-nu_meas * k_per_ghz / T)))


def build_tables(outdir):
    """Write the derived H2O / H2S / PH3 line tables.

    Measured line-center frequencies and (for H2O) lower-state energies
    are retained from the r4 tables; INTENSITIES are derived here.  Each
    species' strongest retained line keeps its r4 S300 anchor so the
    absorbers' absolute scale is unchanged; all ratios are now derived.
    """
    import os

    h2o = {ln["label"]: ln for ln in water_like_lines(
        27.8806, 14.5216, 9.2778, h2o_weight, Jmax=8)}
    h2s = {ln["label"]: ln for ln in water_like_lines(
        10.3735, 9.0161, 4.7313, h2o_weight, Jmax=6)}

    # (label, measured nu0 [GHz], measured E_low [K] or None->derived,
    #  broadening g_self g_H2 g_He n_T from the r4 tables)
    h2o_sel = [
        ((6, (1, 6), 5, (2, 3)), 22.2350800, 642.3, (1.35, 2.80, 0.90, 0.63)),
        ((2, (2, 0), 3, (1, 3)), 183.3101170, 196.8, (1.42, 2.92, 0.95, 0.64)),
        ((4, (2, 2), 5, (1, 5)), 325.1529190, 454.3, (1.30, 2.70, 0.88, 0.66)),
        ((3, (2, 1), 4, (1, 4)), 380.1973720, 305.2, (1.32, 2.73, 0.89, 0.66)),
        ((1, (0, 1), 1, (1, 0)), 556.9359880, None, (1.38, 2.85, 0.92, 0.65)),
    ]
    h2s_sel = [
        ((1, (0, 1), 1, (1, 0)), 168.7627620, None, (1.40, 1.96, 1.20, 0.70)),
        ((2, (1, 1), 2, (2, 0)), 216.7104365, None, (1.36, 1.96, 1.20, 0.70)),
        ((3, (1, 2), 3, (2, 1)), None, None, (1.36, 1.96, 1.20, 0.70)),
        ((2, (0, 2), 2, (1, 1)), None, None, (1.36, 1.96, 1.20, 0.70)),
        ((0, (0, 0), 1, (1, 1)), None, None, (1.40, 1.96, 1.20, 0.70)),
    ]

    def rows_for(sel, table, anchor_label, anchor_s300):
        rows = []
        for label, nu_meas, elow_meas, broad in sel:
            ln = table[label]
            nu = nu_meas if nu_meas is not None else ln["nu"]
            elow = elow_meas if elow_meas is not None else ln["elow"]
            rel = _intensity_at_measured(ln, nu, elow)
            rows.append([label, nu, elow, rel, broad,
                         nu_meas is not None, elow_meas is not None])
        ref = next(r for r in rows if r[0] == anchor_label)
        scale = anchor_s300 / ref[3]
        for r in rows:
            r[3] *= scale
        return sorted(rows, key=lambda r: r[1])

    def fmt(rows, f):
        f.write("# nu0        S300      E_low   g_self  g_H2    g_He"
                "    n_T\n")
        for label, nu, elow, s, broad, numeas, emeas in rows:
            tag = "" if numeas else "   # nu0 derived (rigid rotor)"
            f.write(f"{nu:<12.7f} {s:9.3e} {elow:6.1f}  "
                    f"{broad[0]:<7.2f} {broad[1]:<7.2f} {broad[2]:<7.2f} "
                    f"{broad[3]:.2f}{tag}\n")

    hdr_common = (
        "# Columns: nu0[GHz] S300 E_low[K] gamma_self[GHz/bar] gamma_H2 "
        "gamma_He n_T\n#\n"
        "# S300 values are DERIVED (tools/derive_radio_lines.py): rigid-"
        "rotor\n# eigenvectors give the b-type dipole matrix elements "
        "(validated by the\n# exact dipole sum rule to machine "
        "precision); intensities evaluate\n# nu (1-e^-hnu/kT) g_ns "
        "e^-E_low/kT |mu_fi|^2 / Q at 300 K with the\n# measured line "
        "frequency and lower-state energy where available.\n# The "
        "strongest line keeps the r4 S300 anchor; all RATIOS are "
        "derived.\n# Broadening values are the standard H2/He-broadened "
        "widths.\n#\n")

    with open(os.path.join(outdir, "radio_h2o_lines.txt"), "w") as f:
        f.write("# H2O rotational lines for the van Vleck-Weisskopf "
                "microwave absorber.\n" + hdr_common)
        fmt(rows_for(h2o_sel, h2o, (3, (2, 1), 4, (1, 4)), 2.46e-13), f)
    with open(os.path.join(outdir, "radio_h2s_lines.txt"), "w") as f:
        f.write("# H2S rotational lines for the van Vleck-Weisskopf "
                "microwave absorber.\n" + hdr_common)
        fmt(rows_for(h2s_sel, h2s, (1, (0, 1), 1, (1, 0)), 1.95e-13), f)

    ph3 = ph3_lines(Jmax=3)
    ph3_meas = {0: 266.9445130, 1: 533.7946650, 2: None}
    rows = []
    for ln in ph3:
        J = ln["label"][0]
        if J not in ph3_meas:
            continue
        nu = ph3_meas[J] if ph3_meas[J] is not None else ln["nu"]
        k_per_ghz = K_PER_CM / CM_TO_GHZ
        rel = (ln["inten"] / (ln["nu"] * (1 - np.exp(-ln["nu"] * k_per_ghz
                                                     / 300.0)))
               * nu * (1 - np.exp(-nu * k_per_ghz / 300.0)))
        rows.append([(J,), nu, ln["elow"], rel,
                     (4.20 if J == 0 else 4.10, 3.30, 1.50, 0.70),
                     ph3_meas[J] is not None, False])
    scale = 2.05e-13 / next(r[3] for r in rows if r[0] == (1,))
    for r in rows:
        r[3] *= scale
    with open(os.path.join(outdir, "radio_ph3_lines.txt"), "w") as f:
        f.write("# PH3 rotational lines for the van Vleck-Weisskopf "
                "microwave absorber.\n" + hdr_common.replace(
                    "b-type dipole matrix elements",
                    "K-summed R-branch Hoenl-London strengths"))
        fmt(sorted(rows, key=lambda r: r[1]), f)
    print("wrote derived tables to", outdir)


if __name__ == "__main__":
    print("H2O sum-rule worst dev:", check_sum_rule(27.8806, 14.5216, 9.2778))
    print("H2S sum-rule worst dev:", check_sum_rule(10.3735, 9.0161, 4.7313))

    print("\nH2O lines below 500 GHz (rigid rotor):")
    for ln in water_like_lines(27.8806, 14.5216, 9.2778, h2o_weight):
        if ln["nu"] < 500.0 and ln["inten"] > 1e-6:
            print(f"  {ln['nu']:10.3f} GHz  E_low {ln['elow']:7.1f} K  "
                  f"rel {ln['inten']:.4e}  {ln['label']}")

    print("\nH2S lines below 700 GHz:")
    for ln in water_like_lines(10.3735, 9.0161, 4.7313, h2o_weight, Jmax=6):
        if ln["nu"] < 700.0 and ln["inten"] > 1e-4:
            print(f"  {ln['nu']:10.3f} GHz  E_low {ln['elow']:7.1f} K  "
                  f"rel {ln['inten']:.4e}  {ln['label']}")

    print("\nPH3 R-branch:")
    for ln in ph3_lines():
        print(f"  {ln['nu']:10.3f} GHz  E_low {ln['elow']:7.1f} K  "
              f"rel {ln['inten']:.4e}  J={ln['label'][0]}")
