"""Checkpoint / state save-restore for table-backed modules.

The reference keeps opacity tables in torch registered buffers
(``/root/reference/src/opacity/rfm.cpp:117-119``, ``s8_fuller.cpp:50-52``),
which makes them serializable through torch's module machinery — but nothing
in-repo ever saves or loads them (SURVEY.md section 5.4).  This build ships
the missing piece: attenuators are frozen pytrees, so their state is exactly
their array leaves.  State is stored as a flat ``{path: array}`` mapping in a
compressed ``.npz`` — no pickling, host-side only, never in the jitted path.

Use cases: snapshotting ingested k-tables so workers skip NetCDF parsing
(parallel cold-start), dtype-converted table caches, and restoring a
``Radiation`` driver without the original data files.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import numpy as np


def _is_module_tree(obj: Any) -> bool:
    leaves = jax.tree_util.tree_leaves(obj)
    return len(leaves) > 0


def state_dict(module: Any, prefix: str = "") -> dict[str, np.ndarray]:
    """Flatten a module's array state to ``{path: ndarray}``.

    Accepts a pytree module (attenuators, solvers), a ``RadiationBand``
    (state = its attenuators), or a ``Radiation`` driver (state = its bands).
    """
    out: dict[str, np.ndarray] = {}
    if hasattr(module, "bands"):            # Radiation
        for name, band in module.bands.items():
            out.update(state_dict(band, f"{prefix}{name}/"))
        return out
    if hasattr(module, "attenuators"):      # RadiationBand
        for name, a in module.attenuators.items():
            out.update(state_dict(a, f"{prefix}{name}/"))
        return out
    flat = jax.tree_util.tree_flatten_with_path(module)[0]
    for path, leaf in flat:
        key = prefix + "/".join(
            getattr(p, "name", None) or str(getattr(p, "key", getattr(p, "idx", p)))
            for p in path)
        out[key] = np.asarray(leaf)
    return out


def load_state(module: Any, state: Mapping[str, np.ndarray], prefix: str = ""):
    """Return a copy of ``module`` with array leaves replaced from ``state``.

    Shapes must match (like ``load_state_dict`` in torch); dtypes follow the
    module's current leaves so a float32 module restores float32 no matter
    how the state was saved.
    """
    if hasattr(module, "bands"):
        for name, band in module.bands.items():
            load_state(band, state, f"{prefix}{name}/")
        return module
    if hasattr(module, "attenuators"):
        for name in list(module.attenuators):
            module.attenuators[name] = load_state(
                module.attenuators[name], state, f"{prefix}{name}/")
        return module

    flat, treedef = jax.tree_util.tree_flatten_with_path(module)
    new_leaves = []
    for path, leaf in flat:
        key = prefix + "/".join(
            getattr(p, "name", None) or str(getattr(p, "key", getattr(p, "idx", p)))
            for p in path)
        if key not in state:
            raise KeyError(f"checkpoint is missing state for {key!r}")
        arr = np.asarray(state[key])
        if arr.shape != np.shape(leaf):
            raise ValueError(
                f"shape mismatch for {key!r}: checkpoint {arr.shape} vs "
                f"module {np.shape(leaf)}")
        new_leaves.append(
            jax.numpy.asarray(arr, getattr(leaf, "dtype", arr.dtype)))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save(path: str, module: Any) -> None:
    """Save a module's state to a compressed ``.npz``."""
    sd = state_dict(module)
    if not sd:
        raise ValueError("module has no array state to save")
    np.savez_compressed(path, **sd)


def load(path: str, module: Any):
    """Restore ``module``'s state from :func:`save` output.

    Returns the restored module (pytrees are rebuilt; Band/Radiation
    containers are updated in place and returned).
    """
    with np.load(path) as z:
        state = {k: z[k] for k in z.files}
    return load_state(module, state)


# ---------------------------------------------------------------------------
# parallel (per-host sharded) array IO — SURVEY.md section 5.8: the
# TPU-native replacement for the reference's PNetCDF parallel output
# ---------------------------------------------------------------------------

def save_array_sharded(prefix: str, arr) -> list[str]:
    """Write a (possibly sharded) jax array as per-host shard files.

    Each process writes ONLY its addressable shards —
    ``<prefix>.p<proc>.s<i>.npy`` plus a ``<prefix>.p<proc>.json`` index
    with the global shape and each shard's index slices.  No cross-host
    gather: on a multi-host slice every host does local, contention-free
    IO (the role PNetCDF played for the reference,
    ``cmake/parameters.cmake:11-17``).  Plain numpy arrays degrade to one
    ``.npy``.  Returns the paths written by THIS process.
    """
    import json
    import os

    import jax

    shards = getattr(arr, "addressable_shards", None)
    if shards is None:
        path = f"{prefix}.npy"
        np.save(path, np.asarray(arr))
        return [path]
    pid = jax.process_index()
    meta = {"global_shape": list(np.shape(arr)),
            "dtype": str(arr.dtype),
            "process": pid,
            "shards": []}
    paths = []
    seen = set()
    for i, sh in enumerate(shards):
        idx = tuple(
            (s.start or 0,
             s.stop if s.stop is not None else dim)
            for s, dim in zip(sh.index, np.shape(arr)))
        if idx in seen:            # replicated shard: write once
            continue
        seen.add(idx)
        fn = f"{prefix}.p{pid}.s{i}.npy"
        np.save(fn, np.asarray(sh.data))
        meta["shards"].append({"file": os.path.basename(fn),
                               "index": [list(t) for t in idx]})
        paths.append(fn)
    mpath = f"{prefix}.p{pid}.json"
    with open(mpath, "w") as f:
        json.dump(meta, f)
    return paths + [mpath]


def load_array_sharded(prefix: str) -> np.ndarray:
    """Assemble the global array from every process's shard files.

    Host-side (numpy); reads all ``<prefix>.p*.json`` indexes present in
    the directory — after a multi-host run, gather the per-host files to
    one place first (or point every host at shared storage).
    """
    import glob
    import json
    import os

    if os.path.exists(f"{prefix}.npy"):
        return np.load(f"{prefix}.npy")
    metas = sorted(glob.glob(f"{prefix}.p*.json"))
    if not metas:
        raise FileNotFoundError(f"no shard index files match {prefix}.p*.json")
    with open(metas[0]) as f:
        shape = json.load(f)["global_shape"]
    out = None
    filled = np.zeros(shape, bool)
    dirname = os.path.dirname(os.path.abspath(metas[0]))
    for mpath in metas:
        with open(mpath) as f:
            meta = json.load(f)
        if meta["global_shape"] != shape:
            raise ValueError(f"inconsistent global shapes under {prefix}")
        if out is None:
            out = np.zeros(shape, np.dtype(meta["dtype"]))
        for rec in meta["shards"]:
            sl = tuple(slice(a, b) for a, b in rec["index"])
            out[sl] = np.load(os.path.join(dirname, rec["file"]))
            filled[sl] = True
    if not bool(filled.all()):
        raise ValueError(
            f"shard files under {prefix} do not cover the global array "
            "(gather all hosts' files first)")
    return out
