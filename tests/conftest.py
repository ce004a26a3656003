"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Multi-chip sharding is validated on a virtual CPU mesh (the reference had no
distributed tests at all, SURVEY.md section 4); numeric oracle comparisons run
in float64 on CPU.
"""
import os

# Hard override: the surrounding environment may pin JAX_PLATFORMS to the
# real TPU tunnel (the "axon" plugin ignores the env var); unit tests always
# run on the virtual CPU mesh, forced via jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: repeated pytest runs skip recompilation.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
