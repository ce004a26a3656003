"""Physical constants (SI + cgs).

Parity with the reference constant set (``/root/reference/src/constants.h:4-16``).
"""

Rgas = 8.314462          # J/(mol K)
Rgas_cgs = 8.314462e7
kBoltz = 1.3806504e-23   # J/K
kBoltz_cgs = 1.3806504e-16
Lo = 2.68719e25          # Loschmidt number [1/m^3]

hPlanck = 6.62606957e-34   # J s
hPlanck_cgs = 6.62606957e-27
cLight = 2.99792458e8      # m/s
cLight_cgs = 2.99792458e10
stefanBoltzmann = 5.670374419e-8  # W/(m^2 K^4)

# Second radiation constant hc/k in cm K (used for Planck band integration
# over wavenumber in cm^-1).
c2_cmK = hPlanck * cLight * 100.0 / kBoltz
