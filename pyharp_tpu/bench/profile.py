"""Profiling + roofline accounting helpers (SURVEY.md section 5.1).

The reference has no tracing/profiling at all; the nearest artifacts are
cdisort ``print-*`` debug flags.  Here profiling is first-class:

* :func:`trace` wraps ``jax.profiler`` so any step can be captured and viewed
  in Perfetto/TensorBoard;
* :func:`measure` is the canonical steady-state timer (compile excluded,
  ``block_until_ready`` fenced);
* :func:`roofline` reports achieved FLOP/s and bytes/s against per-chip peak
  estimates, classifying a kernel as compute- or bandwidth-bound.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import jax

# Peak estimates per chip (dense, no sparsity), used only for roofline ratios.
# v5e: 197 TFLOP/s bf16 / 98.5 TFLOP/s f32-on-MXU class workloads, 819 GB/s
# HBM (public TPU v5e spec); CPU numbers are order-of-magnitude placeholders.
PEAKS = {
    "tpu v5 lite": {"flops": 197e12, "bytes": 819e9},
    "tpu v4": {"flops": 275e12, "bytes": 1200e9},
    "cpu": {"flops": 1e11, "bytes": 5e10},
}


def _peaks() -> dict:
    kind = jax.devices()[0].device_kind.lower()
    for name, p in PEAKS.items():
        if name in kind:
            return p
    return PEAKS["cpu"] if jax.default_backend() == "cpu" else PEAKS["tpu v5 lite"]


@contextlib.contextmanager
def trace(logdir: str = "/tmp/pyharp_trace"):
    """``with trace(dir): step(...)`` — captures a jax.profiler trace."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def _force(out) -> float:
    """Force execution by fetching one scalar from the first array leaf.

    On tunneled/remote TPU platforms ``jax.block_until_ready`` can resolve
    before device execution completes for some programs; a device->host
    scalar read always drains the queue.
    """
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.reshape(-1)[0])


def measure(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Steady-state seconds per call of an already-jitted ``fn``.

    Queues all iterations and forces ONCE at the end (like bench.py): on the
    tunneled TPU platform a per-iteration scalar read would add a full
    host<->device round-trip to every sample, inflating small kernels by
    tens of ms.  The single final read drains the whole queue, so its
    one-off RTT is amortized over ``iters``.
    """
    for _ in range(warmup):
        _force(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


@dataclass(frozen=True)
class Roofline:
    seconds: float
    achieved_flops: float        # FLOP/s
    achieved_bw: float           # bytes/s
    flops_frac: float            # fraction of chip peak
    bw_frac: float
    bound: str                   # "compute" | "bandwidth"

    def __str__(self):
        return (f"{self.seconds*1e3:.3f} ms | "
                f"{self.achieved_flops/1e12:.2f} TFLOP/s "
                f"({100*self.flops_frac:.1f}% peak) | "
                f"{self.achieved_bw/1e9:.1f} GB/s "
                f"({100*self.bw_frac:.1f}% peak) | {self.bound}-bound")


def roofline(fn, *args, flops: float, bytes_moved: float,
             iters: int = 10) -> Roofline:
    """Measure ``fn`` and place it on the chip roofline.

    ``flops``/``bytes_moved`` are the caller's per-call operation/traffic
    counts (analytic, e.g. from kernel shape algebra).
    """
    sec = measure(fn, *args, iters=iters)
    p = _peaks()
    af = flops / sec
    ab = bytes_moved / sec
    ff, fb = af / p["flops"], ab / p["bytes"]
    return Roofline(seconds=sec, achieved_flops=af, achieved_bw=ab,
                    flops_frac=ff, bw_frac=fb,
                    bound="compute" if ff >= fb else "bandwidth")


def disort_flop_estimate(nwave: int, ncol: int, nlyr: int, nstr: int,
                         nmode: int = 1) -> float:
    """Analytic FLOP count of one batched DISORT solve (per azimuthal mode
    set): per (wave, col, layer) — Jacobi eigensolve O(s^3) sweeps with
    s = nstr/2, particular solutions O(s^2), block-tridiagonal factor+solve
    O((2s)^3 / 3 + ...).  Constants folded from operation counts of the
    implementation (solver.py)."""
    s = nstr // 2
    per_layer = 30 * s ** 3 + 40 * s ** 2 + (8 * s ** 3) / 3 + 16 * s ** 2
    return float(nmode * nwave * ncol * nlyr * per_layer)
