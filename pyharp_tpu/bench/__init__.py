"""Benchmark, profiling, and scaling harnesses (BASELINE.md metrics)."""

from .profile import (
    trace,
    measure,
    roofline,
    Roofline,
    disort_flop_estimate,
)
from .scaling import build_sharded_step, scaling_run

__all__ = [
    "trace", "measure", "roofline", "Roofline", "disort_flop_estimate",
    "build_sharded_step", "scaling_run",
]
