"""pyharp-tpu: TPU-native high-performance atmospheric radiation package.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of pyharp
(harp = High-performance Atmospheric Radiation Package): plane-parallel
radiative transfer with a batched discrete-ordinates (DISORT-class) solver,
tabulated gas/aerosol opacities, multi-band radiation drivers, and
column/spectral sharding over TPU meshes.

Layer map (mirrors SURVEY.md section 7):

* ``core``      pytree module system, constants, index conventions
* ``interp``    vectorized multilinear interpolation, layer2level
* ``tables``    host-side ingestion (ASCII, RFM NetCDF k-tables)
* ``opacity``   attenuators: RFM, S8Fuller, H2SO4Simple, ...
* ``rt``        RT solvers: disort (discrete ordinates), beer_lambert
* ``radiation`` RadiationBand / Radiation multi-band drivers + YAML config
* ``utils``     directions, spherical flux correction, units
* ``parallel``  device mesh + sharding helpers (columns x spectral)
"""

from .core import constants, index
from .core.module import pytree_dataclass, static_field, replace
from .interp.interpn import interpn, interp1, locate
from .interp.layer2level import (
    Layer2LevelOptions,
    layer2level,
    k2ndOrder,
    k4thOrder,
    kExtrapolate,
    kConstant,
)
from .tables.resource import (
    find_resource,
    add_resource_directory,
    set_search_paths,
    get_search_paths,
)
from .tables.rfm import read_weights_rfm, load_rfm_table, write_rfm_table
from .opacity.base import AttenuatorOptions
from .opacity.aerosol import S8Fuller, H2SO4Simple, SimpleAerosol
from .opacity.rfm import RFM
from .opacity.cia import XizCIA, H2H2CIA, H2HeCIA
from .opacity.clouds import SimpleCloud, Grey
from .rt import (
    Disort,
    DisortOptions,
    BeerLambert,
    BeerLambertOptions,
    PhaseMomentOptions,
    scattering_moments,
)
from .radiation import (
    Radiation,
    RadiationOptions,
    RadiationBand,
    RadiationBandOptions,
    register_attenuator,
    create_radiation_options,
    shared,
)
from .parallel import make_radiation_mesh, init_distributed
from .utils import (
    parse_radiation_directions,
    get_direction_grids,
    spherical_flux_correction,
)

__version__ = "0.1.0"
