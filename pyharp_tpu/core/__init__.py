"""Core: physical constants, optical-property/flux index conventions, and the
frozen-pytree module system (replaces the reference's libtorch nn::Module
runtime, SURVEY.md section 2.3 item 3)."""

from . import constants, index
from .module import pytree_dataclass, static_field, replace

__all__ = ["constants", "index", "pytree_dataclass", "static_field", "replace"]
