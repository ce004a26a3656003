"""Shared tensor blackboard.

Parity with the reference's global ``harp::shared`` map
(``/root/reference/src/radiation/radiation.hpp:17``, ``radiation.cpp:16``)
used to export per-band optical properties ("radiation/<band>/optics",
``radiation_band.cpp:118-120``) and to import host-model geometry
("coordinate/area1", "coordinate/vol", ``radiation.cpp:59-68``).

In the TPU build the blackboard is an ordinary dict that is only meaningful
in eager execution; inside ``jax.jit`` the same data flows through explicit
return values (``Radiation.forward(..., return_aux=True)``).
"""

from __future__ import annotations

from typing import Any

shared: dict[str, Any] = {}
