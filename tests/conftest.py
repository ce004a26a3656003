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
import resource

# XLA:CPU's LLVM pipeline recurses deeply on this package's large fused
# graphs (scalarized per-mode intensity sweeps) and segfaults with the
# default 8 MiB stack; lift the soft limit to the hard limit (the main
# thread's stack grows on demand up to RLIMIT_STACK).
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _soft != resource.RLIM_INFINITY:
    try:
        resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
    except (ValueError, OSError):
        pass

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# NOTE: no persistent compile cache here.  XLA:CPU serializes AOT executables
# tagged with pseudo machine features (prefer-no-scatter/prefer-no-gather)
# that fail the feature check on reload in this environment and then
# segfault mid-suite ("Loading XLA:CPU AOT result ... could lead to
# execution errors such as SIGILL").  TPU benchmarks keep their own cache
# (bench.py); CPU tests recompile each run.
