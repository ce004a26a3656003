"""Pytree-dataclass module system.

The reference framework builds its components as libtorch ``nn::Module``
subclasses with registered buffers (e.g. ``/root/reference/src/opacity/rfm.cpp:117-119``,
``s8_fuller.cpp:50-52``).  The TPU-native equivalent is a *frozen dataclass
registered as a JAX pytree*: array leaves (the "buffers") flow through
``jax.jit`` / ``jax.vmap`` / shardings, while configuration fields are static
aux data baked into the trace.

Usage::

    @pytree_dataclass
    class S8Fuller:
        kwave: jax.Array                 # pytree leaf
        kdata: jax.Array                 # pytree leaf
        options: AttenuatorOptions = static_field()   # static aux

Static fields must be hashable (they become part of the jit cache key).
"""

from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax

T = TypeVar("T")

_STATIC_MARK = "pyharp_static"


def static_field(**kwargs: Any):
    """Declare a dataclass field treated as static (non-traced) aux data."""
    metadata = dict(kwargs.pop("metadata", ()) or {})
    metadata[_STATIC_MARK] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def _split_fields(cls):
    leaves, statics = [], []
    for f in dataclasses.fields(cls):
        (statics if f.metadata.get(_STATIC_MARK) else leaves).append(f.name)
    return tuple(leaves), tuple(statics)


def pytree_dataclass(cls: type[T]) -> type[T]:
    """Decorator: freeze ``cls`` as a dataclass and register it as a pytree."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    leaf_names, static_names = _split_fields(cls)

    def flatten(obj):
        leaves = tuple(getattr(obj, n) for n in leaf_names)
        statics = tuple(getattr(obj, n) for n in static_names)
        return leaves, statics

    def flatten_with_keys(obj):
        leaves = tuple(
            (jax.tree_util.GetAttrKey(n), getattr(obj, n)) for n in leaf_names
        )
        statics = tuple(getattr(obj, n) for n in static_names)
        return leaves, statics

    def unflatten(statics, leaves):
        kwargs = dict(zip(leaf_names, leaves))
        kwargs.update(zip(static_names, statics))
        return cls(**kwargs)

    jax.tree_util.register_pytree_with_keys(cls, flatten_with_keys, unflatten, flatten)
    return cls


def replace(obj: T, **changes: Any) -> T:
    """Functional field update (torch modules mutate; pytrees are replaced)."""
    return dataclasses.replace(obj, **changes)
