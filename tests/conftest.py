"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Multi-chip sharding is validated on a virtual CPU mesh (the reference had no
distributed tests at all, SURVEY.md section 4); numeric oracle comparisons run
in float64 on CPU.

NOTE: in the axon TPU environment, ``sitecustomize`` imports and initializes
jax at interpreter startup (to register the TPU tunnel plugin), which latches
the CPU device count at 1 before any conftest code can run — the
``XLA_FLAGS=--xla_force_host_platform_device_count`` below is then silently
ignored and the suite runs single-device.  Multi-device tests
(tests/test_parallel.py) detect this and re-run themselves in a clean
subprocess with the hook disabled (pytest's fd-level capture makes an exec
of the whole test process silently swallow all output, so per-test
subprocessing is the robust fix).
"""
import os

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
