"""Scoped lifecycle for the library's internal ``persist()`` calls.

A handful of pipelines (MinHash-LSH, n-gram containment, the
self-scored bigram LM) persist ONE intermediate DataFrame that feeds
several consumers in the same plan — columnar ``persist`` measured
4-10x faster there than ``localCheckpoint`` (SCALE.md, round 8).
Spark's CacheManager keys those entries by logical plan and never
releases them on GC, so without bookkeeping a looping driver
accumulates cache entries until it calls the global
``spark.catalog.clearCache()`` — a sledgehammer that also drops the
USER'S caches.

This module gives every internal persist a paired release:

* :func:`scoped_persist` — the library-internal replacement for
  ``df.persist()``.  The frame is persisted as before AND registered
  with the innermost active :func:`cache_scope` (or, with no scope
  active, a module-level registry).
* :func:`cache_scope` — context manager for callers who loop:
  every library persist issued inside the ``with`` block is
  unpersisted (blocking) on exit, and ONLY those — user caches are
  untouched.  Materialise results inside the block::

      with cache_scope():
          pairs = lsh_jaccard_pairs(docs).collect()

  A frame returned OUT of the scope stays correct — unpersist only
  drops cached blocks; re-execution recomputes from lineage.
* :func:`release_caches` — frees every unscoped registration (the
  batch analogue; bench.py calls it between queries instead of
  ``clearCache``).

The reference leans on dask's reference-counted graph memoisation for
the same multi-consumer reuse (daskms/optimisation.py:215-269); Spark
has no refcounted cache, so explicit scope exit is the release point.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator, List

from pyspark.sql import DataFrame

__all__ = ["cache_scope", "scoped_persist", "release_caches",
           "CacheScope"]


class CacheScope:
    """Tracks the DataFrames persisted while the scope was innermost;
    :meth:`release` unpersists exactly those frames (idempotent)."""

    def __init__(self) -> None:
        self._frames: List[DataFrame] = []

    def track(self, df: DataFrame) -> DataFrame:
        self._frames.append(df)
        return df

    @property
    def n_tracked(self) -> int:
        return len(self._frames)

    def release(self) -> int:
        """Blocking-unpersist every tracked frame; returns how many."""
        n = 0
        for df in self._frames:
            try:
                df.unpersist(blocking=True)
                n += 1
            except Exception:  # session already stopped — nothing to free
                pass
        self._frames.clear()
        return n


# innermost-last stack of active scopes + the unscoped registry
_SCOPES: List[CacheScope] = []
_UNSCOPED = CacheScope()


def scoped_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` with a paired release: the frame is registered
    with the innermost :func:`cache_scope` (unpersisted at scope exit)
    or, outside any scope, with the module registry freed by
    :func:`release_caches`."""
    out = df.persist()
    (_SCOPES[-1] if _SCOPES else _UNSCOPED).track(out)
    return out


@contextmanager
def cache_scope() -> Iterator[CacheScope]:
    """Bound the lifetime of the library's internal caches to a block.

    Nested scopes are fine — each persist registers with the innermost
    one.  On exit every frame the block persisted is blocking-
    unpersisted, so ``spark.catalog`` cache-entry counts return to
    their pre-block value (pytest-asserted in tests/test_llm.py).
    """
    scope = CacheScope()
    _SCOPES.append(scope)
    try:
        yield scope
    finally:
        _SCOPES.remove(scope)
        scope.release()


def release_caches() -> int:
    """Unpersist every library-persisted frame not already released by
    a :func:`cache_scope`; returns the number freed.  Unlike
    ``spark.catalog.clearCache()`` this never touches caches the USER
    created."""
    return _UNSCOPED.release()
