"""Shared tensor blackboard.

Parity with the reference's global ``harp::shared`` map
(``/root/reference/src/radiation/radiation.hpp:17``, ``radiation.cpp:16``)
used to export per-band optical properties ("radiation/<band>/optics",
``radiation_band.cpp:118-120``) and to import host-model geometry
("coordinate/area1", "coordinate/vol", ``radiation.cpp:59-68``).

In the TPU build the blackboard is an ordinary dict that is only meaningful
in eager execution; inside ``jax.jit`` the same data flows through explicit
return values (``Radiation.forward(..., return_aux=True)``).  A store made
while tracing (``jax.jit``/``vmap``) must not retain the tracer — a
module-level global outliving the trace is exactly JAX's leaked-tracer
hazard — so :class:`SharedBlackboard` records a sentinel instead and a
later read raises a clear ``RuntimeError`` (same policy as the Disort
eager-accessor stash, ``rt/disort/disort.py``).
"""

from __future__ import annotations

from typing import Any

_TRACED = object()


class SharedBlackboard(dict):
    """Dict that refuses to retain JAX tracers (stores a sentinel instead)."""

    def __setitem__(self, key: str, value: Any) -> None:
        import jax

        leaves = jax.tree_util.tree_leaves(value)
        if any(isinstance(x, jax.core.Tracer) for x in leaves):
            super().__setitem__(key, _TRACED)
        else:
            super().__setitem__(key, value)

    def __getitem__(self, key: str) -> Any:
        value = super().__getitem__(key)
        if value is _TRACED:
            raise RuntimeError(
                f"shared[{key!r}] was written during a traced (jit/vmap) "
                "forward; traced values are not retained — use the explicit "
                "aux outputs (Radiation.forward(..., return_aux=True)) "
                "instead")
        return value

    def get(self, key: str, default: Any = None) -> Any:
        try:
            value = super().__getitem__(key)
        except KeyError:
            return default
        if value is _TRACED:
            return default
        return value


shared: dict[str, Any] = SharedBlackboard()
