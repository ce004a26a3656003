"""Host-side table ingestion (runs at module construction, never under jit).

Replaces the reference's native IO stack: ``src/utils/fileio.cpp`` (ASCII
tables), ``src/opacity/rfm.cpp:36-114`` + ``src/utils/read_weights.cpp``
(NetCDF k-tables), ``src/utils/read_stellar_flux.cpp`` and
``src/utils/find_resource.cpp`` (search-path resolution).
"""

from .ascii import (
    decomment_file,
    read_data_table,
    get_num_cols,
    get_num_rows,
    read_data_vector,
    read_aerosol_profile,
    read_stellar_flux,
)
from .resource import (
    find_resource,
    add_resource_directory,
    set_search_paths,
    get_search_paths,
)
from .rfm import RFMTable, load_rfm_table, read_weights_rfm, write_rfm_table

__all__ = [
    "decomment_file", "read_data_table", "get_num_cols", "get_num_rows",
    "read_data_vector", "read_aerosol_profile", "read_stellar_flux",
    "find_resource", "add_resource_directory", "set_search_paths",
    "get_search_paths",
    "RFMTable", "load_rfm_table", "read_weights_rfm", "write_rfm_table",
]
