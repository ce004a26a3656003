"""Index conventions for optical-property and flux tensors.

Parity with the reference index set (``/root/reference/src/index.h:5-18``).

Optical property tensors are laid out ``(nwave, ncol, nlyr, nprop)`` with the
property axis indexed by ``IEX``/``ISS``/``IPM`` (the reference's band
accumulator used a transposed legacy layout; this build standardizes on the
attenuator layout, see SURVEY.md section 7 "known quirks").
"""

# legacy atmosphere-variable indices
ITM = 0  # temperature
IPR = 1  # pressure
ICX = 2  # mole fractions start

# optical property indices (last axis of prop tensors)
IEX = 0  # extinction cross section / optical thickness
ISS = 1  # single scattering albedo
IPM = 2  # phase function moments start (g_1, g_2, ...)

# flux indices (last axis of flux tensors)
IUP = 0  # upward flux
IDN = 1  # downward flux (direct + diffuse)
