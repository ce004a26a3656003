"""Resource search path.

Parity with the reference's Cantera-style resource finder
(``/root/reference/src/utils/find_resource.cpp:47-169``): a serialized search
path that resolves ``~``, absolute paths, then a list of directories, always
including the package data directory.  The fixed 64 KiB char buffer and mutex
of the C++ version are replaced by a plain Python list (host-side, never
traced).
"""

from __future__ import annotations

import os
import threading
from pathlib import Path

_lock = threading.Lock()

# repo-root /data plays the role of HARP_ROOT_DIR/data (find_resource.cpp:64-69)
_PACKAGE_DATA = Path(__file__).resolve().parents[2] / "data"

_search_paths: list[str] = [".", str(_PACKAGE_DATA)]


def set_search_paths(paths: str | list[str]) -> None:
    """Replace the search path list (colon-separated string accepted)."""
    global _search_paths
    if isinstance(paths, str):
        paths = [p for p in paths.split(":") if p]
    with _lock:
        _search_paths = list(paths) + [str(_PACKAGE_DATA)]


def get_search_paths() -> list[str]:
    with _lock:
        return list(_search_paths)


def add_resource_directory(path: str, prepend: bool = True) -> None:
    with _lock:
        if prepend:
            _search_paths.insert(0, path)
        else:
            _search_paths.append(path)


def find_resource(filename: str) -> str:
    """Resolve ``filename`` against the search path.

    Mirrors ``find_resource.cpp:108-169``: ``~`` expansion, absolute paths
    pass through, otherwise the first match on the search path wins.
    """
    filename = os.path.expanduser(filename)
    if os.path.isabs(filename):
        if os.path.exists(filename):
            return filename
        raise FileNotFoundError(filename)
    for d in get_search_paths():
        cand = os.path.join(d, filename)
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(
        f"Could not find resource {filename!r} on search path "
        f"{get_search_paths()!r}. Add its directory with "
        "pyharp_tpu.add_resource_directory(...)"
    )
