"""Lifecycle management for operator-internal persisted intermediates.

Multi-pass operators (the dedup/LSH family) persist signature tables so
Catalyst does not re-run the Arrow-UDF signature pass once per
self-join side — without the persist, the physical plan re-executes the
fused shingle/minhash pass up to 18× (measured; see
``ngram_jaccard_pairs``). But a ``persist`` with no owner leaks: in a
long-lived session each operator call pins another table until LRU
eviction churns, and callers could not release them without
``spark.catalog.clearCache()``, which also drops *user* caches.

This module gives every operator-internal persist an owner:

- Inside a ``with cache_scope():`` block, persists registered via
  :func:`operator_persist` are unpersisted when the block exits.
  Materialize results inside the block (collect/write/count/
  ``localCheckpoint``) — a lazy plan that still references a scoped
  intermediate recomputes it after exit (correct, just slower).
- Outside any scope, persists accumulate in a global ledger; call
  :func:`release_operator_caches` to free them all. This preserves the
  old "stay cached for the caller's next action" behavior while making
  the lifetime visible and releasable without touching user caches.

Scopes nest: each ``operator_persist`` registers with the innermost
active scope. The scope stack is thread-local (one Spark driver thread
per pipeline); the global ledger is lock-protected.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Iterator, List

from pyspark.sql import DataFrame

try:  # StorageLevel import kept lazy-safe for doc builds
    from pyspark import StorageLevel
    _DEFAULT_LEVEL = StorageLevel.MEMORY_AND_DISK
except Exception:  # pragma: no cover
    _DEFAULT_LEVEL = None

_tls = threading.local()

_ledger_lock = threading.Lock()
_LEDGER: List[DataFrame] = []


def _scope_stack() -> List[List[DataFrame]]:
    stack = getattr(_tls, "stack", None)
    if stack is None:
        stack = []
        _tls.stack = stack
    return stack


def operator_persist(df: DataFrame, level=None) -> DataFrame:
    """Persist an operator-internal intermediate with a managed lifetime.

    Registers the persisted frame with the innermost active
    :func:`cache_scope`, falling back to the module ledger (released by
    :func:`release_operator_caches`).
    """
    df = df.persist(level if level is not None else _DEFAULT_LEVEL)
    stack = _scope_stack()
    if stack:
        stack[-1].append(df)
    else:
        with _ledger_lock:
            _LEDGER.append(df)
    return df


@contextmanager
def cache_scope() -> Iterator[List[DataFrame]]:
    """Bound the lifetime of operator-internal persists to this block.

    On exit every frame registered inside the block is unpersisted
    (non-blocking). User-level ``df.persist()`` calls are untouched.
    """
    bucket: List[DataFrame] = []
    stack = _scope_stack()
    stack.append(bucket)
    try:
        yield bucket
    finally:
        stack.pop()
        for df in bucket:
            try:
                df.unpersist()
            except Exception:  # session already stopped — nothing to free
                pass


def release_operator_caches() -> int:
    """Unpersist every ledger-registered (scope-less) operator cache.

    Returns the number of frames released. Safe to call at any time;
    plans that still reference a released intermediate recompute it.
    """
    with _ledger_lock:
        frames, _LEDGER[:] = _LEDGER[:], []
    released = 0
    for df in frames:
        try:
            df.unpersist()
            released += 1
        except Exception:
            pass
    return released
