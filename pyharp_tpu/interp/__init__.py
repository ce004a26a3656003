"""Vectorized interpolation kernels (replace ``src/math`` + TensorIterator
dispatch with searchsorted+gather under vmap/jit)."""

from .interpn import interpn, interp1, locate
from .layer2level import (
    Layer2LevelOptions,
    layer2level,
    k2ndOrder,
    k4thOrder,
    kExtrapolate,
    kConstant,
)

__all__ = [
    "interpn", "interp1", "locate",
    "Layer2LevelOptions", "layer2level",
    "k2ndOrder", "k4thOrder", "kExtrapolate", "kConstant",
]
