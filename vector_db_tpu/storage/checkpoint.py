"""Checkpointed persistence — save/load of device arrays.

Replaces the reference's JSON persistence + full index rebuild on load
(reference: storage/VectorStorage.java:143-171 Jackson round-trip;
core/VectorDatabase.java:291-313 re-inserts every vector).  Here the index
state itself (codes, codebooks, adjacency, ids, ...) is checkpointed, so load
is O(bytes) instead of O(N * insert) and PQ never retrains on open — fixing
what the reference's native save/load stubs left TODO
(native/index/HNSWIndex.cpp:535-541).

Format: ``<dir>/meta.json`` + ``<dir>/arrays.npz`` (nested dicts flattened
with ``/`` separators).  A write-ahead temp + atomic rename keeps the
checkpoint crash-consistent.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

import numpy as np

_SEP = "/"


def _flatten(prefix: str, tree: dict, out: dict) -> None:
    for key, val in tree.items():
        name = f"{prefix}{_SEP}{key}" if prefix else str(key)
        if isinstance(val, dict):
            _flatten(name, val, out)
        else:
            out[name] = np.asarray(val)


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for name, val in flat.items():
        parts = name.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def save_checkpoint(path: str, meta: dict, arrays: dict) -> None:
    """Atomically write meta.json + arrays.npz under ``path``."""
    os.makedirs(path, exist_ok=True)
    flat: dict[str, np.ndarray] = {}
    _flatten("", arrays, flat)

    fd, tmp = tempfile.mkstemp(dir=path, suffix=".npz.tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, os.path.join(path, "arrays.npz"))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)

    fd, tmp = tempfile.mkstemp(dir=path, suffix=".json.tmp")
    os.close(fd)
    try:
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True)
        os.replace(tmp, os.path.join(path, "meta.json"))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(path: str) -> tuple[dict, dict] | None:
    """Load (meta, arrays) or None if no checkpoint exists / it is corrupt.

    Corrupt checkpoints degrade to empty like the reference
    (storage/VectorStorage.java:163-167 returns an empty list on bad JSON).
    """
    meta_path = os.path.join(path, "meta.json")
    npz_path = os.path.join(path, "arrays.npz")
    if not (os.path.exists(meta_path) and os.path.exists(npz_path)):
        return None
    try:
        with open(meta_path) as f:
            meta = json.load(f)
        with np.load(npz_path, allow_pickle=False) as z:
            flat = {k: z[k] for k in z.files}
    except (json.JSONDecodeError, ValueError, OSError, KeyError):
        return None
    return meta, _unflatten(flat)


def checkpoint_exists(path: str) -> bool:
    return os.path.exists(os.path.join(path, "meta.json"))


def save_checkpoint_streamed(path: str, meta: dict, arrays: dict,
                             lazy_arrays) -> None:
    """Like :func:`save_checkpoint`, but ``lazy_arrays`` — an iterable of
    ``(name, fn)`` pairs — is fetched and written ONE ARRAY AT A TIME
    directly into the npz zip: peak host memory is the largest single lazy
    array, not the checkpoint size.  The save path for payloads that never
    exist on the host in full (parallel/sharded.py ``host_mirror=False``).
    The result is a standard npz ``load_checkpoint`` / numpy can read."""
    import zipfile

    from numpy.lib import format as npformat

    os.makedirs(path, exist_ok=True)
    flat: dict[str, np.ndarray] = {}
    _flatten("", arrays, flat)

    fd, tmp = tempfile.mkstemp(dir=path, suffix=".npz.tmp")
    os.close(fd)
    try:
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_STORED,
                             allowZip64=True) as zf:
            for name, arr in flat.items():
                with zf.open(name + ".npy", "w", force_zip64=True) as f:
                    npformat.write_array(f, np.asarray(arr))
            for name, fn in lazy_arrays:
                with zf.open(name + ".npy", "w", force_zip64=True) as f:
                    npformat.write_array(f, np.asarray(fn()))
        os.replace(tmp, os.path.join(path, "arrays.npz"))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)

    fd, tmp = tempfile.mkstemp(dir=path, suffix=".json.tmp")
    os.close(fd)
    try:
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True)
        os.replace(tmp, os.path.join(path, "meta.json"))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def open_checkpoint_lazy(path: str):
    """``(meta, npz)`` with the npz lazily decompressing each member on
    access (numpy NpzFile semantics) — the restore path that never holds
    more than one member in host memory.  Returns None like
    :func:`load_checkpoint` when absent/corrupt; the caller must close the
    returned npz."""
    meta_path = os.path.join(path, "meta.json")
    npz_path = os.path.join(path, "arrays.npz")
    if not (os.path.exists(meta_path) and os.path.exists(npz_path)):
        return None
    try:
        with open(meta_path) as f:
            meta = json.load(f)
        z = np.load(npz_path, allow_pickle=False)
    except (json.JSONDecodeError, ValueError, OSError, KeyError):
        return None
    return meta, z
