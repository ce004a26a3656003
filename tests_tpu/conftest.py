"""On-TPU test tier configuration.

This directory is the hardware tier the main suite deliberately lacks
(tests/conftest.py forces CPU so CI runs anywhere): everything here runs on
the real chip — the Pallas kernels execute compiled (not interpret-mode),
and the example-level numbers are regression-checked on hardware.

Run with the axon site on the path (see .claude/skills/verify):

    PYTHONPATH=/root/repo:/root/.axon_site python -m pytest tests_tpu -q

The whole directory is skipped when no TPU backend is available, so
accidentally including it in a CPU run is harmless.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# persistent compile cache: shared with bench.py / the examples
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(reason="TPU backend not available")
    for item in items:
        item.add_marker(skip)
