# -*- coding: utf-8 -*-
"""Process-lifetime cache registry + content fingerprints.

Every module-level cache in the engine (collision tables, broadcast ref
handles, raster bands, shingle checkpoints) registers itself here, so

* ``clear_caches()`` is the ONE public reset callers (bench --scaling,
  notebooks) use instead of reaching into module privates, and
* cache keys carry a CONTENT FINGERPRINT (file sizes + mtimes), so an
  input dir regenerated in-place at the same path can never serve stale
  entries.
"""

from __future__ import annotations

import os

_REGISTRY: list[dict] = []


def register(cache: dict) -> dict:
    """Register a module-level cache dict; returns it for inline use:
    ``_MY_CACHE = caches.register({})``."""
    _REGISTRY.append(cache)
    return cache


def registered() -> list[dict]:
    return list(_REGISTRY)


_PURGERS: list = []


def register_purger(fn):
    """Register a callback that deletes a module's ON-DISK artifacts
    (checkpoints).  In-memory registry clearing never touches disk —
    disk checkpoints are content-fingerprinted resume points, correct to
    reuse — so purgers only run on an explicit ``purge_disk=True``."""
    _PURGERS.append(fn)
    return fn


def clear_caches(purge_disk: bool = False) -> int:
    """Empty every registered cache; returns how many dicts were cleared.
    ``purge_disk=True`` additionally runs the registered disk purgers
    (for benchmarks that must measure genuinely cold runs of
    checkpoint-backed operators)."""
    for c in _REGISTRY:
        c.clear()
    if purge_disk:
        for fn in _PURGERS:
            fn()
    return len(_REGISTRY)


def file_fingerprint(path: str) -> tuple:
    """(size, mtime_ns) — changes whenever the file is rewritten."""
    st = os.stat(path)
    return (st.st_size, st.st_mtime_ns)


def dir_fingerprint(path: str) -> tuple:
    """Sorted (relpath, size, mtime_ns) of every file under ``path`` —
    a key component that invalidates on any in-place regeneration."""
    out = []
    for root, _, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            st = os.stat(p)
            out.append((os.path.relpath(p, path), st.st_size, st.st_mtime_ns))
    return tuple(sorted(out))


def path_fingerprint(path: str) -> tuple:
    return dir_fingerprint(path) if os.path.isdir(path) \
        else file_fingerprint(path)
