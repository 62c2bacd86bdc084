"""Structural ownership of engine-internal persists.

Several operators persist an intermediate whose lifetime OUTLIVES the
operator call — the returned DataFrame references the cached plan
lazily (e.g. the EWMA chunk aggregate, the mart-IVM lifted deltas,
the dedup shingle pipelines feeding a self-join). Through round 12
that was a documented convention: "the caller should
spark.catalog.clearCache() between queries". This module makes the
ownership STRUCTURAL instead of documented:

- operators call :func:`owned_persist` instead of bare
  ``DataFrame.persist()`` for any cache the caller would otherwise
  have to clean up;
- consumers (the differ, the bench loop, each streaming micro-batch)
  bound those lifetimes with ``with engine_cache_scope():`` — on
  exit, exactly the persists taken inside the scope are released,
  never a user's own caches the way ``clearCache()`` was.

Persists that an operator releases ITSELF before returning (e.g. the
IVF residual pipeline, the BM25 tf table) stay bare ``persist()`` —
they are already scoped.

The registry is THREAD-LOCAL: a streaming ``foreachBatch`` step runs
on the micro-batch thread and must not release scopes opened on the
driver's main thread (or vice versa); each thread's scopes nest
independently.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

_LOCAL = threading.local()


def _owned() -> list:
    if not hasattr(_LOCAL, "dfs"):
        _LOCAL.dfs = []
    return _LOCAL.dfs


def _depth() -> int:
    return getattr(_LOCAL, "depth", 0)


def owned_persist(df: DataFrame) -> DataFrame:
    """``persist()`` a DataFrame whose cache must outlive the operator
    that created it, registering it for release by the innermost
    enclosing :func:`engine_cache_scope` on this thread. Outside any
    scope the behavior degrades to the old convention (the persist
    stays until a consumer cleans up) — existing callers keep
    working; scoped consumers get deterministic release. The
    registration only happens INSIDE a scope: an unscoped caller gets
    the persist but no list entry, so a long-lived session that never
    opens scopes cannot accumulate permanent DataFrame references in
    the thread-local registry (it still owns the persisted blocks, as
    the old convention always did)."""
    df.persist()
    if _depth() > 0:
        _owned().append(df)
    return df


@contextmanager
def engine_cache_scope():
    """Bound the lifetime of every :func:`owned_persist` taken inside
    the block: on exit they are unpersisted (and deregistered), in
    reverse order, regardless of exceptions. Scopes nest; each
    releases only its own persists."""
    owned = _owned()
    mark = len(owned)
    _LOCAL.depth = _depth() + 1
    try:
        yield
    finally:
        _LOCAL.depth = _depth() - 1
        for df in reversed(owned[mark:]):
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001 — session may be gone
                pass
        del owned[mark:]
